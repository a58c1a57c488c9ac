"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Schema: (repo:string, path:string, commit:string, lang:string, content:string).
Content mixes the FIXTURES.md §1 token classes: zipfian-head keywords
('public', 'import', ... — the skew probe), HOST-rule dotted names, NUM-rule
mixed tokens, APOSTROPHE/ACRONYM/COMPANY/EMAIL shapes, all 33 stopwords,
mixed case, one >255-char token, and doc lengths spanning byte315 norm
boundaries. Seeded and row-order-stable so docIDs are deterministic.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

HEAD_WORDS = ["public", "import", "class", "void", "return", "static", "new", "int"]
MID_WORDS = [
    "string", "value", "index", "result", "buffer", "count", "size", "data",
    "reader", "writer", "token", "query", "field", "term", "doc", "score",
    "FooBar", "BazQux", "HashMap", "ArrayList", "stream", "filter",
]
RARE_WORDS = [f"rare{i}" for i in range(64)] + ["zyzzyva", "quux", "xenon", "obsidian"]
SPECIAL = [
    "System.IO.TextReader", "a.b.c", "3.14", "x86_64", "v1.2.3", "127.0.0.1",
    "don't", "O'Reilly's", "U.S.A.", "AT&T", "dev@example.com", "foo_bar",
    "src/module2/File3.cs", "i18n", "utf8",
]
STOPS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)
LANGS = ["csharp", "python", "java", "markdown"]
EXTS = {"csharp": "cs", "python": "py", "java": "java", "markdown": "md"}
NORM_EDGE_LENGTHS = [1, 2, 3, 7, 8, 9, 100, 250, 255, 256, 1000]


def generate_corpus(num_rows: int = 1000, seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    overlong = "x" * 300  # exceeds maxTokenLength 255 -> skipped by tokenizer
    for i in range(num_rows):
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        repo = f"org{int(rng.integers(0, 20))}/proj{int(rng.integers(0, 10))}"
        path = f"src/module{int(rng.integers(0, 50))}/File{i}.{EXTS[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        if i < len(NORM_EDGE_LENGTHS):
            # pinned-length docs across norm quantization boundaries
            n = NORM_EDGE_LENGTHS[i]
            words = ["public"] + [MID_WORDS[int(rng.integers(0, len(MID_WORDS)))] for _ in range(n - 1)]
        else:
            n = int(rng.integers(5, 120))
            words = []
            for _ in range(n):
                r = rng.random()
                if r < 0.35:
                    words.append(HEAD_WORDS[int(rng.integers(0, len(HEAD_WORDS)))])
                elif r < 0.60:
                    words.append(MID_WORDS[int(rng.integers(0, len(MID_WORDS)))])
                elif r < 0.72:
                    words.append(STOPS[int(rng.integers(0, len(STOPS)))])
                elif r < 0.82:
                    words.append(SPECIAL[int(rng.integers(0, len(SPECIAL)))])
                elif r < 0.84:
                    words.append(overlong)
                else:
                    words.append(RARE_WORDS[int(rng.integers(0, len(RARE_WORDS)))])
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(" ".join(words))
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents}
    )


def reference_query_set() -> list[tuple[str, str]]:
    """(name, classic-syntax query) pairs per FIXTURES.md §2."""
    return [
        ("term_rare", "zyzzyva"),
        ("term_head", "public"),
        ("term_mid", "query"),
        ("term_absent", "notinthecorpusatall"),
        ("bool_and", "+public +zyzzyva"),
        ("bool_and_mid", "public AND query"),
        ("bool_or", "query token score"),
        ("bool_or5", "public import class void return"),
        ("bool_not", "+query -public"),
        ("bool_mixed", "+query token -zyzzyva"),
        ("host_term", "system.io.textreader"),
        ("prefix", "rare*"),
        ("wildcard", "qu?ry"),
        ("fuzzy", "quer~1"),
        ("range", "[rare1 TO rare3]"),
    ]
