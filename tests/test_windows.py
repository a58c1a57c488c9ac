"""Windowed aggregates: tumbling + session windows over crafted events."""

import datetime as dt

import pyarrow as pa
import ray.data

from lucene_net_ray.stages.windows import sessionize, tumbling_window_agg


def _events(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=r[1]) for r in rows],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[3] for r in rows], type=pa.string()),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )
    )


def test_tumbling_windows():
    # two hourly windows; per (win, type) counts and sums
    rows = [
        (0, 10, 1, "click", 1.0),
        (1, 20, 1, "click", 2.0),
        (2, 30, 2, "view", 5.0),
        (3, 3700, 1, "click", 7.0),  # next hour
    ]
    got = {
        (r["win"], r["key"]): (r["n_events"], r["sum_value"])
        for r in tumbling_window_agg(_events(rows)).take_all()
    }
    base = dt.datetime(2024, 1, 1).timestamp() * 1_000_000 // 3_600_000_000
    assert got[(base, "click")] == (2, 3.0)
    assert got[(base, "view")] == (1, 5.0)
    assert got[(base + 1, "click")] == (1, 7.0)


def test_sessionize():
    GAP = 1800  # seconds
    rows = [
        (0, 0, 1, "a", 1.0),
        (1, 100, 1, "a", 2.0),          # same session (gap 100s)
        (2, 100 + GAP + 1, 1, "a", 4.0),  # gap > 30min -> new session
        (3, 50, 2, "a", 9.0),            # other user
    ]
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in sessionize(_events(rows), gap_us=GAP * 1_000_000).take_all()
    }
    assert got[(1, 1)] == (2, 3.0)
    assert got[(1, 2)] == (1, 4.0)
    assert got[(2, 1)] == (1, 9.0)
    # a gap of exactly the timeout does NOT split (strict >)
    rows2 = [(0, 0, 1, "a", 1.0), (1, GAP, 1, "a", 2.0)]
    got2 = sessionize(_events(rows2), gap_us=GAP * 1_000_000).take_all()
    assert len(got2) == 1 and got2[0]["n_events"] == 2


def test_funnel_counts():
    """Greedy first-match funnel with (ts, event_id) ordering: step events
    must be strictly later than the matched previous step."""
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from lucene_net_ray.stages.windows import funnel_counts

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, user, typ, secs):
        return {"event_id": eid, "user_id": user, "event_type": typ,
                "ts": t0 + dt.timedelta(seconds=secs)}

    rows = [
        # user 1: full conversion in order
        ev(1, 1, "view", 0), ev(2, 1, "click", 10), ev(3, 1, "purchase", 20),
        # user 2: click BEFORE view -> stops at view
        ev(4, 2, "click", 0), ev(5, 2, "view", 10),
        # user 3: view then purchase but no click -> stops at view
        ev(6, 3, "view", 0), ev(7, 3, "purchase", 5),
        # user 4: no view at all -> reaches nothing
        ev(8, 4, "click", 0), ev(9, 4, "purchase", 5),
        # user 5: simultaneous ts, event_id breaks the tie (view id 10 <
        # click id 11 at the same instant -> click counts as later)
        ev(10, 5, "view", 0), ev(11, 5, "click", 0),
    ]
    out = funnel_counts(
        ray.data.from_items(rows), ("view", "click", "purchase")
    ).to_pandas().set_index("step")
    assert out.loc[1, "n_users"] == 4   # users 1,2,3,5 have a view
    assert out.loc[2, "n_users"] == 2   # users 1 and 5 click after view
    assert out.loc[3, "n_users"] == 1   # only user 1 purchases after click
    assert list(out["event_type"]) == ["view", "click", "purchase"]


def test_hopping_windows():
    """Hopping windows: each event lands in window_us/hop_us overlapping
    windows; totals across one hop equal the tumbling equivalent."""
    import datetime as dt

    import pyarrow as pa
    import pytest as _p
    import ray.data

    from lucene_net_ray.stages.windows import hopping_window_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": 1, "event_type": "a", "value": 1.0,
         "ts": t0 + dt.timedelta(minutes=5)},   # hop index 0 (15-min hops)
        {"event_id": 2, "event_type": "a", "value": 2.0,
         "ts": t0 + dt.timedelta(minutes=20)},  # hop index 1
    ]
    out = hopping_window_agg(
        ray.data.from_items(rows),
        window_us=3_600_000_000, hop_us=900_000_000,
    ).to_pandas()
    base = dt.datetime(1970, 1, 1)
    h0 = int((t0 - base).total_seconds() * 1e6) // 900_000_000
    w = out.set_index("win_start")
    # event 1 in windows starting h0-3..h0; event 2 in h0-2..h0+1
    assert set(out["win_start"]) == set(range(h0 - 3, h0 + 2))
    assert w.loc[h0, "n_events"] == 2 and w.loc[h0, "sum_value"] == 3.0
    assert w.loc[h0 - 3, "n_events"] == 1 and w.loc[h0 - 3, "sum_value"] == 1.0
    assert w.loc[h0 + 1, "n_events"] == 1 and w.loc[h0 + 1, "sum_value"] == 2.0
    with _p.raises(ValueError):
        hopping_window_agg(ray.data.from_items(rows), window_us=100, hop_us=33)
