"""Index-bound ValueSources for the expression kernel.

Semantics pinned from the reference Queries/Function/ValueSources/:
  TermFreqValueSource.cs (raw freq), TFValueSource.cs (ClassicSimilarity
  Tf = sqrt(freq)), DocFreqValueSource.cs, IDFValueSource.cs
  (ClassicSimilarity Idf = ln(maxDoc/(df+1)) + 1),
  TotalTermFreqValueSource.cs, SumTotalTermFreqValueSource.cs,
  MaxDocValueSource.cs, NumDocsValueSource.cs, NormValueSource.cs
  (decodeNormValue = byte315ToFloat), OrdFieldSource.cs (0-based ord into
  sorted distinct values; GetOrd semantics), ReverseOrdFieldSource.cs
  (valueCount - ord - 1), QueryValueSource.cs (sub-query score, default
  where not matching).
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_net_ray.pipelines.build import build_index_from_table
from lucene_net_ray.pipelines.expressions import (
    ExpressionError,
    bind_index_expression,
    compile_expression,
    expression_rescore,
    function_query,
    has_index_requests,
    index_requests,
)
from lucene_net_ray.pipelines.search import Searcher
from lucene_net_ray.query import parse_query

TEXTS = [
    "spark spark merge",
    "merge window",
    "spark",
    "plain text here",
    "spark spark spark merge merge",
    "window pane",
    "spark merge",
    "merge",
]
LANGS = ["en", "de", "en", "fr", "de", "en", "fr", "en"]
NCHARS = [17, 12, 5, 15, 29, 11, 11, 5]
N = len(TEXTS)
TOK = [t.split() for t in TEXTS]
DF_SPARK = sum(1 for ts in TOK if "spark" in ts)  # 4
TTF_SPARK = sum(ts.count("spark") for ts in TOK)  # 7
SUM_TTF = sum(len(ts) for ts in TOK)  # 19


@pytest.fixture(scope="module")
def vs_searcher(tmp_path_factory):
    docs = pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "content": pa.array(TEXTS),
            "lang": pa.array(LANGS),
            "n_chars": pa.array(NCHARS, pa.int64()),
        }
    )
    out = str(tmp_path_factory.mktemp("vsidx") / "idx")
    meta = build_index_from_table(
        docs, out, content_column="content", stored_columns=("lang", "n_chars")
    )
    return Searcher(meta, use_actors=False)


def one(searcher, expr):
    return function_query(searcher, expr, k=1)[0][1]


def test_static_analysis():
    req = index_requests("tf('a') + df('b') * idf('c') + ord('f') + query('x y', 0.5)")
    assert req["tf_terms"] == {"a"}
    assert req["stat_terms"] == {"b", "c"}
    assert req["ord_fields"] == {"f"}
    assert req["queries"] == {"x y": 0.5}
    assert has_index_requests("norm()") and has_index_requests("maxdoc()")
    assert not has_index_requests("log(score) + n_chars")
    with pytest.raises(ExpressionError):
        index_requests("df(foo)")  # non-literal argument
    with pytest.raises(ExpressionError):
        index_requests("query('a')")  # missing default


def test_unbound_index_call_fails_at_compile():
    with pytest.raises(ExpressionError):
        compile_expression("df('spark') + score")


def test_scalar_sources(vs_searcher):
    assert one(vs_searcher, "maxdoc()") == float(N)
    assert one(vs_searcher, "numdocs()") == float(N)
    assert one(vs_searcher, "df('spark')") == float(DF_SPARK)
    assert one(vs_searcher, "ttf('spark')") == float(TTF_SPARK)
    assert one(vs_searcher, "sumttf()") == float(SUM_TTF)
    assert one(vs_searcher, "idf('spark')") == pytest.approx(
        math.log(N / (DF_SPARK + 1.0)) + 1.0, abs=0
    )
    # absent term: df 0, idf = ln(maxDoc/1) + 1
    assert one(vs_searcher, "df('zyzzyva')") == 0.0
    assert one(vs_searcher, "idf('zyzzyva')") == pytest.approx(math.log(N) + 1.0)


def test_termfreq_and_tf(vs_searcher):
    hits = dict(function_query(vs_searcher, "termfreq('spark')", k=N))
    assert hits == {i: float(ts.count("spark")) for i, ts in enumerate(TOK)}
    hits = dict(function_query(vs_searcher, "tf('spark')", k=N))
    assert hits == {i: math.sqrt(ts.count("spark")) for i, ts in enumerate(TOK)}


def test_norm_decodes_byte315(vs_searcher):
    from lucene_net_ray.functions.norms import BYTE315_DECODE, encode_norm

    hits = dict(function_query(vs_searcher, "norm()", k=N))
    want = {i: float(BYTE315_DECODE[encode_norm(len(ts))]) for i, ts in enumerate(TOK)}
    assert hits == want


def test_ord_and_rord(vs_searcher):
    langs_sorted = sorted(set(LANGS))  # de, en, fr
    card = len(langs_sorted)
    hits = dict(function_query(vs_searcher, "ord('lang')", k=N))
    assert hits == {i: float(langs_sorted.index(l)) for i, l in enumerate(LANGS)}
    hits = dict(function_query(vs_searcher, "rord('lang')", k=N))
    assert hits == {
        i: float(card - 1 - langs_sorted.index(l)) for i, l in enumerate(LANGS)
    }


def test_query_valuesource(vs_searcher):
    # query('merge', 0.1): per-doc BM25 score of the sub-query, 0.1 default
    merge_scores = dict(vs_searcher.scored_docs(parse_query("merge")))
    hits = dict(function_query(vs_searcher, "query('merge', 0.1)", k=N))
    assert set(hits) == set(range(N))
    for d in range(N):
        assert hits[d] == pytest.approx(merge_scores.get(d, 0.1), abs=0)


def test_composite_expression_exact(vs_searcher):
    from lucene_net_ray.functions.norms import BYTE315_DECODE, encode_norm

    expr = (
        "log(1 + termfreq('spark')) * idf('spark') + 3.0*rord('lang')"
        " + 100.0*norm() + where(n_chars > 14, 0.5, 0.0) + query('merge', 0.1)"
    )
    hits = function_query(vs_searcher, expr, k=N)
    langs_sorted = sorted(set(LANGS))
    card = len(langs_sorted)
    idf = math.log(N / (DF_SPARK + 1.0)) + 1.0
    merge_scores = dict(vs_searcher.scored_docs(parse_query("merge")))
    exp = {}
    for i, ts in enumerate(TOK):
        exp[i] = (
            math.log(1 + ts.count("spark")) * idf
            + 3.0 * (card - 1 - langs_sorted.index(LANGS[i]))
            + 100.0 * float(BYTE315_DECODE[encode_norm(len(ts))])
            + (0.5 if NCHARS[i] > 14 else 0.0)
            + merge_scores.get(i, 0.1)
        )
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(d, round(s, 9)) for d, s in hits] == [(d, round(s, 9)) for d, s in want]


def test_actor_path_identical(vs_searcher):
    expr = "tf('spark')*idf('spark') + norm() + query('merge window', 0.0) + ord('lang')"
    s2 = Searcher(vs_searcher.index, use_actors=True, num_actors=2)
    assert function_query(vs_searcher, expr, k=N) == function_query(s2, expr, k=N)


def test_rescore_with_index_sources(vs_searcher):
    # candidates from BM25 'spark', rescored purely by termfreq('merge')
    hits = expression_rescore(
        vs_searcher, parse_query("spark"), "termfreq('merge')", k=4, window=10
    )
    spark_docs = {i for i, ts in enumerate(TOK) if "spark" in ts}
    assert {d for d, _ in hits} <= spark_docs
    for d, s in hits:
        assert s == float(TOK[d].count("merge"))
    # top doc is the spark doc with most merges (doc 4: 2)
    assert hits[0] == (4, 2.0)


def test_bind_skips_when_no_requests(vs_searcher):
    bind, ispec = bind_index_expression(vs_searcher, "log(score) + n_chars")
    assert bind is None
    assert not (ispec["tf_terms"] or ispec["norm"] or ispec["ords"] or ispec["queries"])
