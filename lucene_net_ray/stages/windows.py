"""Windowed aggregates over event streams (the custom-operator class the
charter calls out: "a windowed aggregate ... as a composition of map_batches
+ groupby().map_groups + sort").

  tumbling_window_agg  fixed epoch-aligned windows: the window id is a pure
                       per-row function (vectorized in map_batches), so the
                       ONLY exchange is the final groupby(win, keys) over
                       already-partial aggregates — no sort, no sessions
                       state. Partitioning assumption: none (stateless).
  sessionize           session windows (gap > timeout splits): needs all of
                       one user's events together, so it is ONE
                       groupby(user).map_groups; inside the group the sort +
                       gap-split + per-session reduce are vectorized numpy.
                       Partitioning assumption: a single user's events fit a
                       worker (true at any realistic fan-out; a user with
                       10^9 events would need salting by coarse time range).

Both are SQL-expressible (epoch arithmetic / lag-over-partition
sessionization) and carry hash-exact oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    window_us: int = 3_600_000_000,
    ts_column: str = "ts",
    value_column: str = "value",
    key_column: str = "event_type",
) -> ray.data.Dataset:
    """(win, key, n_events, sum_value) per epoch-aligned tumbling window."""

    def bucket(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_column).cast(pa.int64()).to_numpy()
        win = us // window_us
        t = pa.table(
            {
                "win": pa.array(win, type=pa.int64()),
                "key": batch.column(key_column),
                "value": batch.column(value_column).cast(pa.float64()),
            }
        )
        # combiner-before-shuffle: pre-aggregate within the batch
        return (
            t.group_by(["win", "key"])
            .aggregate([("value", "sum"), ([], "count_all")])
            .rename_columns(["win", "key", "value_sum", "n"])
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["win", "key"])
        .sum(["value_sum", "n"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "win": batch.column("win"),
                "key": batch.column("key"),
                "n_events": batch.column("sum(n)").cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(batch.column("sum(value_sum)").to_numpy(), 6),
                    type=pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(
    ds: ray.data.Dataset,
    *,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    ts_column: str = "ts",
    value_column: str = "value",
    key_column: str = "event_type",
) -> ray.data.Dataset:
    """(win_start, key, n_events, sum_value) per epoch-aligned HOPPING
    (sliding) window of length ``window_us`` advancing every ``hop_us`` —
    the overlapping counterpart of tumbling_window_agg. An event at time t
    lands in every window whose start lies in (t - window_us, t]; the
    per-event replication factor is the constant window_us / hop_us (each
    event is emitted to its windows BEFORE the batch-local pre-aggregation,
    so the exchange still carries one row per (batch, window, key), not
    per event). window_us must be a multiple of hop_us."""
    if window_us % hop_us != 0:
        raise ValueError("window_us must be a multiple of hop_us")
    k = window_us // hop_us

    def bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(pc.cast(batch.column(ts_column), pa.timestamp("us")), pa.int64())
        us = us.to_numpy(zero_copy_only=False)
        base = us // hop_us  # last window start index containing the event
        n = us.size
        # replicate each event into its k windows: start index base-k+1..base
        offs = np.arange(k, dtype=np.int64)
        win = (base[:, None] - offs[None, :]).reshape(-1)
        keep = win >= 0  # clamp at epoch start, like generate_series in SQL
        vals = np.repeat(
            batch.column(value_column).cast(pa.float64()).to_numpy(zero_copy_only=False), k
        )
        keys = batch.column(key_column).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        )
        t = pa.table(
            {
                "win_start": pa.array(win[keep]),
                "key": keys.filter(pa.array(keep)),
                "value": pa.array(vals[keep]),
            }
        )
        return (
            t.group_by(["win_start", "key"])
            .aggregate([("value", "sum"), ([], "count_all")])
            .rename_columns(["win_start", "key", "value_sum", "n"])
        )

    agg = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["win_start", "key"])
        .sum(["value_sum", "n"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "win_start": batch.column("win_start"),
                "key": batch.column("key"),
                "n_events": batch.column("sum(n)").cast(pa.int64()),
                "sum_value": pa.array(
                    np.round(batch.column("sum(value_sum)").to_numpy(), 6),
                    type=pa.float64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    *,
    gap_us: int = 1_800_000_000,
    ts_column: str = "ts",
    user_column: str = "user_id",
    value_column: str = "value",
    id_column: str = "event_id",
) -> ray.data.Dataset:
    """(user_id, session_id, n_events, sum_value, start_us) session windows:
    a new session starts when the gap to the previous event of the same user
    exceeds ``gap_us``. session_id numbers sessions per user from 1 in time
    order (ties broken by event id — deterministic on both engine and SQL
    sides)."""

    def split_sessions(group: pa.Table) -> pa.Table:
        t = group.sort_by([(ts_column, "ascending"), (id_column, "ascending")])
        us = t.column(ts_column).cast(pa.int64()).to_numpy()
        vals = t.column(value_column).cast(pa.float64()).to_numpy()
        brk = np.ones(us.size, dtype=np.int64)
        if us.size > 1:
            brk[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], us.size)
        uid = t.column(user_column)[0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(starts.size, uid), type=pa.int64()),
                "session_id": pa.array(sid[starts], type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "sum_value": pa.array(
                    np.round(np.add.reduceat(vals, starts), 6), type=pa.float64()
                ),
                "start_us": pa.array(us[starts], type=pa.int64()),
            }
        )

    return ds.groupby(user_column).map_groups(split_sessions, batch_format="pyarrow")


def funnel_counts(
    ds: "ray.data.Dataset",
    steps: "tuple[str, ...]",
    *,
    user_column: str = "user_id",
    type_column: str = "event_type",
    ts_column: str = "ts",
    id_column: str = "event_id",
) -> "ray.data.Dataset":
    """Ordered funnel analysis: per user, greedy first-match walk through
    ``steps`` (each step's event must be strictly LATER than the matched
    previous step's); returns (step, event_type, n_users) = how many users
    reached each step. The standard product-analytics funnel, expressed as
    ONE groupby(user) shuffle with a vectorized per-group walk (events of a
    user sort once; each step is a searchsorted over the matching subset).

    Event order is true (ts, event_id) lexicographic comparison (the SQL
    oracle mirrors it with ROW(ts, event_id) struct ordering — no composite
    integer key, so no overflow and no id-range assumption). Partitioning
    assumption (documented like sessionize's): one user's events fit one
    group task."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    nsteps = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def per_user(group: pa.Table) -> pa.Table:
        uid = group.column(user_column)[0].as_py()
        ts_us = pc.cast(group.column(ts_column), pa.timestamp("us")).cast(pa.int64())
        ts_us = ts_us.to_numpy(zero_copy_only=False)
        eid = group.column(id_column).to_numpy(zero_copy_only=False)
        types = group.column(type_column).to_pylist()
        order = np.lexsort((eid, ts_us))
        ts2, id2 = ts_us[order], eid[order]
        tcodes = np.array([step_of.get(t, -1) for t in types], dtype=np.int64)[order]
        prev_ts, prev_id = np.int64(-(2**62)), np.int64(-1)
        reached = 0
        for si in range(nsteps):
            sel = tcodes == si
            tt, ii = ts2[sel], id2[sel]
            later = (tt > prev_ts) | ((tt == prev_ts) & (ii > prev_id))
            j = np.argmax(later) if later.any() else -1
            if j < 0:
                break
            prev_ts, prev_id = tt[j], ii[j]
            reached = si + 1
        return pa.table({
            "user_id": pa.array([uid], type=pa.int64()),
            "reached": pa.array([reached], type=pa.int64()),
        })

    per = ds.groupby(user_column).map_groups(per_user, batch_format="pyarrow")

    def expand(batch: pa.Table) -> pa.Table:
        # user reaching step k counts toward steps 1..k (funnel is cumulative)
        r = batch.column("reached").to_numpy(zero_copy_only=False)
        out_step, out_n = [], []
        for si in range(1, nsteps + 1):
            out_step.append(si)
            out_n.append(int((r >= si).sum()))
        return pa.table({"step": pa.array(out_step, type=pa.int64()),
                         "n_users": pa.array(out_n, type=pa.int64())})

    agg = per.map_batches(expand, batch_format="pyarrow").groupby("step").sum("n_users")
    agg = agg.rename_columns({"sum(n_users)": "n_users"})

    def label(batch: pa.Table) -> pa.Table:
        s = batch.column("step").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "event_type", pa.array([steps[i - 1] for i in s], type=pa.string())
        )

    return agg.map_batches(label, batch_format="pyarrow")
