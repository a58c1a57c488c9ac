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
    """Deterministic synthetic corpus; fully vectorized sampling (a per-row
    Python loop took minutes at the multi-million-row bench scale)."""
    rng = np.random.default_rng(seed)
    overlong = "x" * 300  # exceeds maxTokenLength 255 -> skipped by tokenizer

    lang_idx = rng.integers(0, len(LANGS), size=num_rows)
    org = rng.integers(0, 20, size=num_rows)
    proj = rng.integers(0, 10, size=num_rows)
    module = rng.integers(0, 50, size=num_rows)
    langs = [LANGS[i] for i in lang_idx]
    repos = [f"org{o}/proj{p}" for o, p in zip(org, proj)]
    paths = [f"src/module{m}/File{i}.{EXTS[l]}" for i, (m, l) in enumerate(zip(module, langs))]
    commits = [hashlib.sha1(f"{r}:{p}".encode()).hexdigest() for r, p in zip(repos, paths)]

    n_edge = min(len(NORM_EDGE_LENGTHS), num_rows)
    lens = rng.integers(5, 120, size=num_rows)
    lens[:n_edge] = NORM_EDGE_LENGTHS[:n_edge]

    # one flat token draw for the whole corpus, then per-doc joins
    total = int(lens.sum())
    r = rng.random(total)
    pick = rng.integers(0, 1 << 30, size=total)
    vocab_lists = [HEAD_WORDS, MID_WORDS, STOPS, SPECIAL, [overlong], RARE_WORDS]
    bounds = np.array([0.35, 0.60, 0.72, 0.82, 0.84, 1.01])
    cat = np.searchsorted(bounds, r, side="right")
    flat = np.empty(total, dtype=object)
    for ci, words in enumerate(vocab_lists):
        mask = cat == ci
        flat[mask] = np.array(words, dtype=object)[pick[mask] % len(words)]
    offs = np.concatenate(([0], np.cumsum(lens)))
    # pinned-length docs across norm quantization boundaries: head word + MIDs
    for i in range(n_edge):
        s, e = offs[i], offs[i + 1]
        flat[s] = "public"
        flat[s + 1 : e] = np.array(MID_WORDS, dtype=object)[pick[s + 1 : e] % len(MID_WORDS)]
    contents = [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(num_rows)]
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
