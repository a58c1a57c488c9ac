"""WikipediaTokenizer analog.

Reference surface:
  /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Wikipedia/WikipediaTokenizer.cs
(type taxonomy + output modes; the jflex grammar impl is ABSENT from the
reference tree — like the Galician resource — so the markup recognition
here is built from the public MediaWiki syntax, and conformance is pinned
by this repo's own vectors in tests/test_wikipedia.py).

Token types (WikipediaTokenizer.cs:42-52):
  il   internal link        [[target|anchor]]
  el   external link anchor [http://u anchor] -> anchor words
  elu  external link URL    the URL itself
  ci   citation             <ref>...</ref>
  c    category             [[Category:...]]
  b    bold                 '''...'''
  i    italics              ''...''
  bi   bold italics         '''''...'''''
  h    heading              ==...==
  sh   sub heading          ===...===
  word plain text

Output modes (WikipediaTokenizer.cs:80-92):
  TOKENS_ONLY       split every region into word tokens typed by the region
  UNTOKENIZED_ONLY  emit each marked-up region in ``untokenized_types`` as
                    ONE token (plain text still word-split)
  BOTH              the whole-region token AND its word tokens
"""

from __future__ import annotations

import re

TOKENS_ONLY = "tokens"
UNTOKENIZED_ONLY = "untokenized"
BOTH = "both"

INTERNAL_LINK = "il"
EXTERNAL_LINK = "el"
EXTERNAL_LINK_URL = "elu"
CITATION = "ci"
CATEGORY = "c"
BOLD = "b"
ITALICS = "i"
BOLD_ITALICS = "bi"
HEADING = "h"
SUB_HEADING = "sh"
WORD = "word"

# longest-match-first alternation over the markup constructs
_MARKUP = re.compile(
    r"""(?:
        (?P<citation><ref[^>/]*>(?P<ci_body>.*?)</ref>) |
        (?P<category>\[\[\s*Category\s*:(?P<cat_body>[^\]]*)\]\]) |
        (?P<ilink>\[\[(?P<il_body>[^\]]*)\]\]) |
        (?P<elink>\[(?P<el_url>https?://[^\s\]]+)(?P<el_anchor>[^\]]*)\]) |
        (?P<subheading>^===(?P<sh_body>[^=\n]+)===\s*$) |
        (?P<heading>^==(?P<h_body>[^=\n]+)==\s*$) |
        (?P<bolditalics>'''''(?P<bi_body>.+?)''''') |
        (?P<bold>'''(?P<b_body>.+?)''') |
        (?P<italics>''(?P<i_body>.+?)'')
    )""",
    re.VERBOSE | re.DOTALL | re.MULTILINE,
)

_WORD = re.compile(r"[A-Za-z0-9_]+(?:[.'][A-Za-z0-9_]+)*")


def _words(text: str) -> list[str]:
    return _WORD.findall(text)


def _regions(text: str):
    """-> ordered (region_text, type) covering the whole input; plain text
    between markup gets type 'word'."""
    out = []
    pos = 0
    for m in _MARKUP.finditer(text):
        if m.start() > pos:
            out.append((text[pos : m.start()], WORD))
        if m.group("citation") is not None:
            out.append((m.group("ci_body"), CITATION))
        elif m.group("category") is not None:
            out.append((m.group("cat_body"), CATEGORY))
        elif m.group("ilink") is not None:
            out.append((m.group("il_body").replace("|", " "), INTERNAL_LINK))
        elif m.group("elink") is not None:
            out.append((m.group("el_url"), EXTERNAL_LINK_URL))
            anchor = m.group("el_anchor").strip()
            if anchor:
                out.append((anchor, EXTERNAL_LINK))
        elif m.group("subheading") is not None:
            out.append((m.group("sh_body"), SUB_HEADING))
        elif m.group("heading") is not None:
            out.append((m.group("h_body"), HEADING))
        elif m.group("bolditalics") is not None:
            out.append((m.group("bi_body"), BOLD_ITALICS))
        elif m.group("bold") is not None:
            out.append((m.group("b_body"), BOLD))
        elif m.group("italics") is not None:
            out.append((m.group("i_body"), ITALICS))
        pos = m.end()
    if pos < len(text):
        out.append((text[pos:], WORD))
    return out


def wikipedia_tokenize(
    text: str,
    token_output: str = TOKENS_ONLY,
    untokenized_types: set[str] | frozenset[str] = frozenset(),
) -> list[tuple[str, str]]:
    """-> [(token, type)] per the reference's three output modes. In
    UNTOKENIZED_ONLY/BOTH, regions whose type is in ``untokenized_types``
    contribute their whole trimmed text as one token (BOTH also word-splits
    them); other regions always word-split."""
    out: list[tuple[str, str]] = []
    for body, typ in _regions(text):
        untok = typ != WORD and typ in untokenized_types
        if untok and token_output in (UNTOKENIZED_ONLY, BOTH):
            whole = " ".join(body.split())
            if whole:
                out.append((whole, typ))
            if token_output == UNTOKENIZED_ONLY:
                continue
        if typ == EXTERNAL_LINK_URL:
            out.append((body, typ))
            continue
        out.extend((w, typ) for w in _words(body))
    return out


class WikipediaAnalyzer:
    """Analyzer-compatible wrapper: wiki-tokenize, lowercase, drop stopwords.
    ``keep_types`` restricts the emitted token types (None = all)."""

    kind = "wikipedia"

    def __init__(
        self,
        token_output: str = TOKENS_ONLY,
        untokenized_types: set[str] | frozenset[str] = frozenset(),
        keep_types: set[str] | None = None,
        stop_words: frozenset[str] = frozenset(),
    ):
        self.token_output = token_output
        self.untokenized_types = frozenset(untokenized_types)
        self.keep_types = keep_types if keep_types is None else set(keep_types)
        self.stop_words = frozenset(stop_words)
        self.max_token_length = 255

    def __call__(self, text: str) -> list[str]:
        toks = wikipedia_tokenize(text, self.token_output, self.untokenized_types)
        out = []
        for t, typ in toks:
            if self.keep_types is not None and typ not in self.keep_types:
                continue
            t = t.lower()
            if t and t not in self.stop_words and len(t) <= self.max_token_length:
                out.append(t)
        return out

    def tokenize_typed(self, text: str) -> list[tuple[str, str]]:
        return wikipedia_tokenize(text, self.token_output, self.untokenized_types)

    def config(self) -> dict:
        return {
            "kind": "wikipedia",
            "token_output": self.token_output,
            "untokenized_types": sorted(self.untokenized_types),
            "keep_types": sorted(self.keep_types) if self.keep_types is not None else None,
        }
