"""Salted (hot-user-safe) sessionize / funnel vs the plain operators:
identical output for any salt, including salt_us < gap_us (merge chains
spanning many blocks)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.windows import (
    funnel_counts,
    funnel_counts_salted,
    sessionize,
    sessionize_salted,
)

GAP = 1_800_000_000  # 30 min


def _events(rng, n_users=20, n_events=600, span_us=4 * 86_400_000_000):
    uid = rng.integers(0, n_users, size=n_events)
    ts = rng.integers(0, span_us, size=n_events)
    val = np.round(rng.normal(10, 3, size=n_events), 3)
    types = rng.choice(["view", "click", "purchase", "other"], size=n_events)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_events), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(uid, type=pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(val, type=pa.float64()),
        }
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize(
    "salt_us",
    [
        600_000_000,  # 10 min < gap: chains merge across MANY blocks
        3_600_000_000,  # 1 h
        21_600_000_000,  # 6 h
    ],
)
def test_sessionize_salted_equivalence(salt_us):
    rng = np.random.default_rng(7)
    tbl = _events(rng)
    plain = _canon(sessionize(ray.data.from_arrow(tbl), gap_us=GAP).to_pandas())
    salted = _canon(
        sessionize_salted(
            ray.data.from_arrow(tbl), gap_us=GAP, salt_us=salt_us
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_sessionize_salted_chain_across_blocks():
    # one user, events every 10 min for 6 hours -> ONE session spanning
    # every 1-hour block; plus a second session after a 2-hour silence
    n = 37
    ts = np.arange(n, dtype=np.int64) * 600_000_000
    ts = np.concatenate([ts, ts[-1] + 7_200_000_000 + np.array([0, 600_000_000])])
    m = ts.size
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(m), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(np.zeros(m, dtype=np.int64)),
            "event_type": pa.array(["view"] * m),
            "value": pa.array(np.ones(m), type=pa.float64()),
        }
    )
    out = _canon(
        sessionize_salted(
            ray.data.from_arrow(tbl), gap_us=GAP, salt_us=3_600_000_000
        ).to_pandas()
    )
    assert list(out.session_id) == [1, 2]
    assert list(out.n_events) == [n, 2]
    assert out.sum_value.tolist() == [float(n), 2.0]
    assert out.start_us.tolist() == [0, int(ts[n])]


@pytest.mark.parametrize("salt_us", [600_000_000, 21_600_000_000])
def test_funnel_salted_equivalence(salt_us):
    rng = np.random.default_rng(11)
    tbl = _events(rng, n_users=30, n_events=900)
    steps = ("view", "click", "purchase")
    plain = _canon(funnel_counts(ray.data.from_arrow(tbl), steps).to_pandas())
    salted = _canon(
        funnel_counts_salted(
            ray.data.from_arrow(tbl), steps, salt_us=salt_us
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_funnel_salted_cross_block_order():
    # view in block 0, click in block 2, purchase in block 1 (BEFORE the
    # click) -> purchase must NOT count (greedy order respected across
    # blocks); a later purchase in block 3 completes the funnel
    ts = np.array([0, 7_300_000_000, 3_700_000_000, 11_000_000_000], dtype=np.int64)
    types = ["view", "click", "purchase", "purchase"]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(4), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array(np.zeros(4, dtype=np.int64)),
            "event_type": pa.array(types),
            "value": pa.array(np.ones(4), type=pa.float64()),
        }
    )
    steps = ("view", "click", "purchase")
    out = (
        funnel_counts_salted(
            ray.data.from_arrow(tbl), steps, salt_us=3_600_000_000
        )
        .to_pandas()
        .sort_values("step")
    )
    assert out.n_users.tolist() == [1, 1, 1]
    # drop the block-3 purchase -> funnel stalls at click
    tbl2 = tbl.slice(0, 3)
    out2 = (
        funnel_counts_salted(
            ray.data.from_arrow(tbl2), steps, salt_us=3_600_000_000
        )
        .to_pandas()
        .sort_values("step")
    )
    assert out2.n_users.tolist() == [1, 1, 0]


def test_sf0001_events_salted_matches_plain():
    sf = "/root/testdata/sf0.001"
    ds1 = ray.data.read_parquet(f"{sf}/events.parquet")
    ds2 = ray.data.read_parquet(f"{sf}/events.parquet")
    plain = _canon(sessionize(ds1, gap_us=GAP).to_pandas())
    salted = _canon(
        sessionize_salted(ds2, gap_us=GAP, salt_us=21_600_000_000).to_pandas()
    )
    pd.testing.assert_frame_equal(plain, salted)
