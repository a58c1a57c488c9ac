"""Percolator stage: registered queries vs a document stream."""

import pyarrow as pa
import ray.data

from lucene_net_ray.stages.percolate import percolate


def test_percolate_matches():
    docs = [
        "spark merge pipeline",     # 0: AND + none else
        "vector database search",   # 1: vector
        "window functions in sql",  # 2: window-or-stream
        "stream processing spark",  # 3: window-or-stream (not AND: no merge)
        "nothing relevant at all",  # 4: none
    ]
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    out = percolate(ds, {
        "q_and": "+merge +spark",
        "q_term": "vector",
        "q_or": "window stream",
        "q_not": "+spark -merge",
    }).to_pandas()
    got = {(r.doc_id, r.query_name) for r in out.itertuples()}
    assert got == {
        (0, "q_and"),
        (1, "q_term"),
        (2, "q_or"), (3, "q_or"),
        (3, "q_not"),  # spark without merge
    }


def test_percolate_phrase_and_empty():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["exact phrase here", "phrase exact here"],
    }))
    out = percolate(ds, {"p": '"exact phrase"'}).to_pandas()
    assert set(out["doc_id"]) == {0}
    none = percolate(ds, {"z": "absentterm"}).to_pandas()
    assert len(none) == 0


def test_percolate_prefilter_equals_bruteforce():
    """The vectorized candidate prefilter + exact fast path must emit exactly
    the per-doc MemoryIndex matches for every query shape: term, AND, OR,
    minShouldMatch, NOT, phrase, sloppy phrase, prefix (no-prune fallback)."""
    import itertools

    from lucene_net_ray.functions.analysis import Analyzer
    from lucene_net_ray.oracle import OracleIndex
    from lucene_net_ray.query import parse_query
    from lucene_net_ray.query import BooleanClause, BooleanQuery, PrefixQuery, TermQuery

    vocab = ["alpha", "beta", "gamma", "delta", "omega"]
    docs = [
        " ".join(p) for r in (1, 2, 3) for p in itertools.permutations(vocab, r)
    ][:120]
    queries = {
        "t": "alpha",
        "and": "+alpha +beta",
        "or": "gamma delta",
        "not": "+beta -gamma",
        "msm2": BooleanQuery(
            clauses=tuple(
                BooleanClause(TermQuery(term=t), "SHOULD")
                for t in ("alpha", "beta", "omega")
            ),
            min_should_match=2,
        ),
        "phrase": '"alpha beta"',
        "sloppy": parse_query('"alpha gamma"~2'),
        "prefix": PrefixQuery(prefix="de"),
    }
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(docs))), "text": docs})
    )
    out = percolate(ds, queries).to_pandas()
    got = {(r.doc_id, r.query_name) for r in out.itertuples()}

    analyzer = Analyzer()
    oracle = OracleIndex(docs, analyzer=analyzer)
    parsed = {
        n: (q if not isinstance(q, str) else parse_query(q, analyzer=analyzer))
        for n, q in queries.items()
    }
    expected = {
        (d, n)
        for n, q in parsed.items()
        for d in range(len(docs))
        if (s := oracle._eval(d, q)) is not None and s > 0
    }
    assert got == expected


def test_percolate_exact_fastpath_skips_eval():
    """Term/AND/OR query sets never build the per-batch oracle index."""
    from lucene_net_ray.stages.percolate import PercolatorStage

    st = PercolatorStage({"a": "+merge +spark", "b": "vector", "c": "window stream"})
    assert not st._need_oracle
    st2 = PercolatorStage({"a": '"exact phrase"'})
    assert st2._need_oracle
