"""Expression scoring (Lucene.Net.Expressions analog)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.expressions import (
    ExpressionError,
    compile_expression,
    expression_fields,
    expression_rescore,
)
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import TermQuery


def test_compile_and_eval():
    fn = compile_expression("score * 2 + log1p(boostcol)")
    scores = np.array([1.0, 2.0], dtype=np.float32)
    vals = {"boostcol": np.array([0.0, np.e - 1])}
    out = fn(scores, vals)
    assert np.allclose(out, [2.0, 5.0])
    assert expression_fields("score * 2 + log1p(boostcol)") == ["boostcol"]
    assert compile_expression("where(v > 2, score, 0)")(scores, {"v": np.array([1, 3])}).tolist() == [0.0, 2.0]


def test_rejects_unsafe():
    for bad in ("__import__('os')", "score.attr", "open('x')", "a if b else c", "[1,2]"):
        with pytest.raises((ExpressionError, SyntaxError)):
            compile_expression(bad)
    with pytest.raises(ExpressionError):
        compile_expression("unknowncol + 1")({}, {})  # unknown at eval w/o field
    # unknown identifiers fail at compile (dummy eval)
    fn = compile_expression("known * 1")  # fine: treated as a field
    assert expression_fields("known * 1") == ["known"]


def test_expression_rescore(tmp_path):
    docs = ["target one", "target two", "target three", "target four"]
    pop = [5, 50, 500, 1]
    tbl = pa.table({"content": docs, "popularity": pop})
    idx = str(tmp_path / "idx")
    build_index_from_table(tbl, idx, target_rows_per_segment=2, stored_columns=("popularity",))
    s = Searcher(idx, use_actors=False)
    hits = expression_rescore(s, TermQuery(term="target"), "score + log1p(popularity)", k=4)
    assert [d for d, _ in hits] == [2, 1, 0, 3]  # popularity dominates


def test_function_query_matchall_primary(tmp_path):
    """FunctionQuery: the formula IS the score under MatchAll — exact
    ordering over every doc, no BM25 window."""
    from lucene_net_ray.pipelines.expressions import function_query

    docs = [f"doc number {i}" for i in range(20)]
    pop = [(i * 7) % 13 for i in range(20)]
    tbl = pa.table({"content": docs, "popularity": pop})
    idx = str(tmp_path / "idx")
    build_index_from_table(tbl, idx, target_rows_per_segment=6, stored_columns=("popularity",))
    s = Searcher(idx, use_actors=False)
    hits = function_query(s, "popularity * 2.0", k=5)
    expected = sorted(range(20), key=lambda d: (-pop[d] * 2.0, d))[:5]
    assert [d for d, _ in hits] == expected
    assert [sc for _, sc in hits] == [pop[d] * 2.0 for d in expected]


def test_function_query_with_underlying_query_score(tmp_path):
    """`score` inside the formula is the underlying query's BM25 score; docs
    not matching q are excluded (FunctionQuery wrapped over a real query)."""
    from lucene_net_ray.pipelines.expressions import function_query
    from lucene_net_ray.pipelines.collectors import function_rescore

    docs = ["target alpha", "target beta", "other gamma", "target delta"]
    pop = [1, 100, 1000, 10]
    tbl = pa.table({"content": docs, "popularity": pop})
    idx = str(tmp_path / "idx")
    build_index_from_table(tbl, idx, target_rows_per_segment=2, stored_columns=("popularity",))
    s = Searcher(idx, use_actors=False)
    hits = function_query(s, "score * 0.0 + popularity", q=TermQuery(term="target"), k=4)
    assert [d for d, _ in hits] == [1, 3, 0]  # doc 2 doesn't match


def test_scale_value_source(tmp_path):
    """ScaleFloatFunction analog: scale(field, a, b) maps the field's GLOBAL
    range onto [a, b] using distributed min/max."""
    from lucene_net_ray.pipelines.expressions import function_query, scale_fields

    assert scale_fields("scale(pop, 0, 100) + score") == ["pop"]

    pop = [10, 20, 30, 40, 50, 60, 70, 90]
    docs = [f"item number{i}" for i in range(len(pop))]
    tbl = pa.table({"content": docs, "pop": pop})
    idx = str(tmp_path / "idx")
    build_index_from_table(tbl, idx, target_rows_per_segment=3, stored_columns=("pop",))
    s = Searcher(idx, use_actors=False)
    hits = function_query(s, "scale(pop, 0.0, 100.0)", k=8)
    # min=10 max=90 -> scaled = (v-10)/80*100
    expected = sorted(
        ((d, (v - 10) / 80 * 100) for d, v in enumerate(pop)),
        key=lambda x: (-x[1], x[0]),
    )
    assert [(d, sc) for d, sc in hits] == expected
    # degenerate range -> the lower bound
    tbl2 = pa.table({"content": ["a b", "a c"], "pop": [5, 5]})
    idx2 = str(tmp_path / "idx2")
    build_index_from_table(tbl2, idx2, target_rows_per_segment=2, stored_columns=("pop",))
    s2 = Searcher(idx2, use_actors=False)
    hits2 = function_query(s2, "scale(pop, 3.0, 9.0)", k=2)
    assert [sc for _, sc in hits2] == [3.0, 3.0]


def test_scale_requires_stats():
    from lucene_net_ray.pipelines.expressions import ExpressionError, compile_expression

    with pytest.raises(ExpressionError):
        compile_expression("scale(pop, 0, 1)")
