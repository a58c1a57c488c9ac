"""Training-set decontamination (public GPT-3/PaLM-style n-gram overlap)."""

import numpy as np
import ray.data

from lucene_net_ray.stages.decontam import contaminant_grams, decontaminate


def _ds(texts):
    return ray.data.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])


BENCH = ["the quick brown fox jumps over the lazy dog tonight"]


def test_substring_decontamination():
    grams = contaminant_grams(BENCH, ngram=8)
    assert grams == ["the quick brown fox jumps over the lazy"]
    corpus = [
        "prefix text the quick brown fox jumps over the lazy dog end",  # leaked
        "the quick brown fox stops here",                               # partial only
        "completely unrelated words in this document",
        BENCH[0],                                                       # the benchmark itself
    ]
    kept = {r["doc_id"] for r in decontaminate(_ds(corpus), grams).take_all()}
    assert kept == {1, 2}


def test_shingle_decontamination_matches_substring_for_full_grams():
    grams = contaminant_grams(BENCH, ngram=8)
    corpus = [
        "aaa bbb the quick brown fox jumps over the lazy ccc",  # leaked (token-aligned)
        "the quick brown fox stops here",
        "totally clean document about other things entirely",
        "xx " * 20,
    ]
    sub = {r["doc_id"] for r in decontaminate(_ds(corpus), grams, method="substring").take_all()}
    shi = {r["doc_id"] for r in decontaminate(_ds(corpus), grams, method="shingle", ngram=8).take_all()}
    assert sub == shi == {1, 2, 3}


def test_shingle_threshold():
    bench = ["a b c d", "w x y z"]
    grams = contaminant_grams(bench, ngram=4)
    corpus = [
        "a b c d and w x y z together",  # 2 gram hits
        "only a b c d here",             # 1 hit
        "nothing shared at all",
    ]
    k1 = {r["doc_id"] for r in decontaminate(_ds(corpus), grams, method="shingle", ngram=4, threshold=1).take_all()}
    k2 = {r["doc_id"] for r in decontaminate(_ds(corpus), grams, method="shingle", ngram=4, threshold=2).take_all()}
    assert k1 == {2}
    assert k2 == {1, 2}


def test_lm_quality_scores():
    """Natural repeated-pattern text must outscore token soup under the
    self-trained backoff LM; scores are deterministic."""
    from lucene_net_ray.stages.textstats import lm_quality_scores

    natural = ["the cat sat on the mat"] * 6
    soup = ["zq pf mat the wk cat xv"]
    ds = _ds(natural + soup)
    rows = lm_quality_scores(ds, text_column="text", grams=2).take_all()
    by_id = {r["doc_id"]: r["lm_logprob"] for r in rows}
    assert all(by_id[i] > by_id[6] for i in range(6))
    rows2 = lm_quality_scores(ds, text_column="text", grams=2).take_all()
    assert {r["doc_id"]: r["lm_logprob"] for r in rows2} == by_id


def test_repetition_stats():
    """Gopher repetition rules: hand vectors incl. the degenerate cases."""
    import pyarrow as pa

    from lucene_net_ray.stages.textstats import repetition_stats_batch

    docs = [
        "a a a a b",          # top token 4/5, distinct 2/5, top bigram "a a" 3/4
        "w x y z",            # all distinct: top 1/4, distinct 1.0, bigrams all 1/3
        "spam",               # single token: bigram frac 0
        "",                   # empty: everything 0
        "go go go go",        # fully repeated
    ]
    out = repetition_stats_batch(
        pa.table({"doc_id": list(range(5)), "text": docs})
    ).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 5
    assert out.loc[0, "top_token_frac"] == 0.8
    assert out.loc[0, "distinct_frac"] == 0.4
    assert out.loc[0, "top_2gram_frac"] == 0.75
    assert out.loc[1, "distinct_frac"] == 1.0
    assert out.loc[1, "top_token_frac"] == 0.25
    assert abs(out.loc[1, "top_2gram_frac"] - 0.333333) < 1e-9
    assert out.loc[2, "n_tokens"] == 1 and out.loc[2, "top_2gram_frac"] == 0.0
    assert out.loc[3, "n_tokens"] == 0 and out.loc[3, "top_token_frac"] == 0.0
    assert out.loc[4, "top_token_frac"] == 1.0 and out.loc[4, "top_2gram_frac"] == 1.0


def test_decontaminate_semantic():
    """Embedding-level decontamination: benchmark vectors (cos=1) drop,
    orthogonal vectors survive, audit column reflects the max cosine."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.stages.decontam import decontaminate_semantic

    rng = np.random.default_rng(5)
    bench = rng.normal(size=(3, 16))
    near = bench[0] + rng.normal(scale=0.01, size=16)  # paraphrase-leak analog
    far = rng.normal(size=(4, 16))
    vecs = np.vstack([bench, near[None, :], far]).astype(np.float32)
    t = pa.table({"vec_id": np.arange(8, dtype=np.int64),
                  "embedding": [v.tolist() for v in vecs]})
    out = decontaminate_semantic(
        ray.data.from_arrow(t), bench, threshold=0.95
    ).to_pandas()
    kept = set(out["vec_id"])
    assert not kept & {0, 1, 2, 3}  # bench rows + near-dup all dropped
    assert len(kept) >= 3  # random 16-dim vectors are far from bench
    assert (out["max_benchmark_cos"] < 0.95).all()
