"""Naive Bayes classifier + taxonomy facets / drill-sideways."""

import pyarrow as pa
import ray.data

from lucene_net_ray.pipelines.facets import drill_down, drill_sideways, taxonomy_counts
from lucene_net_ray.stages.classify import classify_dataset, nb_log_scores, train_naive_bayes


def test_naive_bayes_train_and_classify():
    train_rows = (
        [{"text": "goal striker football match pitch", "label": "sport"}] * 5
        + [{"text": "election vote parliament policy", "label": "politics"}] * 5
        + [{"text": "match replay striker goal", "label": "sport"}] * 2
    )
    ds = ray.data.from_items(train_rows)
    model = train_naive_bayes(ds)
    assert model["n_docs"] == 12
    assert set(model["classes"]) == {"sport", "politics"}
    assert model["classes"]["sport"]["doc_count"] == 7
    # priors reflect doc counts
    import math
    assert abs(model["classes"]["sport"]["log_prior"] - math.log(7 / 12)) < 1e-12

    test_ds = ray.data.from_items(
        [
            {"text": "the striker scored a goal"},
            {"text": "parliament passed the policy vote"},
        ]
    )
    # NOTE: Ray Data does not preserve block order under load
    # (preserve_order defaults off), so key predictions by row content
    preds = {
        r["text"]: r["pred_label"] for r in classify_dataset(test_ds, model).take_all()
    }
    assert preds["the striker scored a goal"] == "sport"
    assert preds["parliament passed the policy vote"] == "politics"
    # hand-check one score: laplace smoothing over vocab
    s = nb_log_scores(model, ["goal"])
    assert s["sport"] > s["politics"]


def test_taxonomy_counts():
    rows = [
        {"path": "lang/en/us"},
        {"path": "lang/en/gb"},
        {"path": "lang/de"},
        {"path": ""},
    ]
    ds = ray.data.from_items(rows)
    got = {r["path"]: r["n_docs"] for r in taxonomy_counts(ds, "path").take_all()}
    assert got == {
        "lang": 3, "lang/en": 2, "lang/en/us": 1, "lang/en/gb": 1, "lang/de": 1,
    }


def test_drill_down_and_sideways():
    rows = []
    for lang in ("en", "de"):
        for size in ("short", "long"):
            for i in range((2 if lang == "en" else 1) * (3 if size == "long" else 1)):
                rows.append({"lang": lang, "size": size})
    ds = ray.data.from_items(rows)
    filters = {"lang": "en", "size": "long"}
    assert drill_down(ds, filters).count() == 6
    res = drill_sideways(ds, filters)
    assert res["hits"] == 6
    # lang facet: size filter applied, own lang filter removed
    lang_counts = {r["lang"]: r["n_docs"] for r in res["facets"]["lang"].take_all()}
    assert lang_counts == {"en": 6, "de": 3}
    # size facet: lang filter applied, own size filter removed
    size_counts = {r["size"]: r["n_docs"] for r in res["facets"]["size"].take_all()}
    assert size_counts == {"long": 6, "short": 2}


def test_range_facet_counts():
    """RangeFacetCounts.cs: overlapping ranges each count containing docs;
    nulls count nowhere; zero-count ranges present."""
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.pipelines.facets import range_counts

    ds = ray.data.from_arrow(
        pa.table({"v": [10, 20, 30, 40, None, 50]})
    )
    out = range_counts(
        ds,
        "v",
        [
            ("low", None, 25, True, False),      # 10,20
            ("mid", 20, 40, True, True),         # 20,30,40 (overlaps low)
            ("high", 45, None, False, True),     # 50
            ("none", 1000, None, True, True),    # zero-count kept
        ],
    ).to_pandas().set_index("label")["n_docs"].to_dict()
    assert out == {"low": 2, "mid": 3, "high": 1, "none": 0}


def test_association_facet_sums():
    """Association facets: per facet label, SUM of an associated value (+
    doc count); taxonomy mode rolls up every path prefix."""
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.pipelines.facets import association_facet_sums

    tbl = pa.table(
        {
            "path": ["a/x", "a/y", "a/x", "b/x", "", None],
            "w": [10, 20, 5, 7, 99, 99],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    flat = {
        r["facet"]: (r["sum_value"], r["n_docs"])
        for r in association_facet_sums(ds, "path", "w").take_all()
    }
    assert flat == {"a/x": (15.0, 2), "a/y": (20.0, 1), "b/x": (7.0, 1)}
    tax = {
        r["facet"]: (r["sum_value"], r["n_docs"])
        for r in association_facet_sums(ds, "path", "w", taxonomy=True).take_all()
    }
    assert tax == {
        "a": (35.0, 3), "a/x": (15.0, 2), "a/y": (20.0, 1),
        "b": (7.0, 1), "b/x": (7.0, 1),
    }


def test_sampled_facet_counts_matches_brute(ray_session):
    import hashlib

    import numpy as np

    import pyarrow as pa
    import ray.data

    from lucene_net_ray.pipelines.facets import sampled_facet_counts
    from lucene_net_ray.stages.clean import mix_threshold_hex

    rng = np.random.default_rng(5)
    langs = rng.choice(["en", "de"], size=200).tolist()
    texts = [
        ("merge " if rng.random() < 0.6 else "other ") + f"doc {i}"
        for i in range(200)
    ]
    tbl = pa.table({"lang": langs, "text": texts})
    got = sampled_facet_counts(
        ray.data.from_arrow(tbl).repartition(4), term="merge", fraction=0.5
    )
    thr = mix_threshold_hex(0.5)
    hits = [(l, hashlib.md5(t.encode()).hexdigest()[:8]) for l, t in zip(langs, texts)
            if "merge" in t.split()]
    samp = [l for l, h in hits if h < thr]
    exp = {}
    for l in samp:
        exp[l] = exp.get(l, 0) + 1
    assert dict(zip(got["lang"], got["n_sampled"])) == exp
    for _, row in got.iterrows():
        assert row["est"] == row["n_sampled"] * len(hits) // len(samp)


def test_sampled_facet_counts_full_fraction_is_exact(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.pipelines.facets import sampled_facet_counts

    tbl = pa.table({"lang": ["en", "en", "de"], "text": ["merge a", "merge b", "merge c"]})
    got = sampled_facet_counts(ray.data.from_arrow(tbl), term="merge", fraction=1.0)
    assert dict(zip(got["lang"], got["est"])) == {"en": 2, "de": 1}
    assert (got["est"] == got["n_sampled"]).all()


def test_sampled_facet_counts_zero_sample(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_net_ray.pipelines.facets import sampled_facet_counts

    tbl = pa.table({"lang": ["en"], "text": ["merge only"]})
    got = sampled_facet_counts(ray.data.from_arrow(tbl), term="merge", fraction=0.0)
    assert len(got) == 0 and list(got.columns) == ["lang", "n_sampled", "est"]
