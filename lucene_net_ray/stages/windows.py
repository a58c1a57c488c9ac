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
                       worker. For corpora where that can fail, the salted
                       variants below (sessionize_salted /
                       funnel_counts_salted) remove the bound exactly —
                       no task ever holds more than one (user, time-block)
                       of events — and are driver-proven hash-exact against
                       the SAME SQL oracles.

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


# ---------------------------------------------------------------------------
# Salted variants: the hot-user scale path
# ---------------------------------------------------------------------------
#
# sessionize/funnel_counts above shuffle ALL of a user's events into one
# group task — correct at any realistic fan-out, but a pathological user
# with 10^9 events would overflow a worker (the documented caveat). The
# *_salted variants below remove that bound: events group by
# (user, ts // salt_us) so no task ever holds more than one time-block of
# one user, and the cross-block state is reconciled exactly:
#
#   sessionize_salted  per-block sessions carry their block ordinal; the
#                      only sessions a block boundary can affect are each
#                      block's FIRST and LAST (events are time-partitioned,
#                      so the only cross-block link is last-event(b) ->
#                      first-event(b')). A per-user walk over the
#                      *boundary summaries only* (2 rows per non-empty
#                      block) merges boundary chains and assigns global
#                      session-id offsets; interior sessions then pick up
#                      their ids in one keyed join. Unrounded per-session
#                      sums travel through the merge and are rounded once
#                      at emit, and both reduceat and the chain add
#                      left-to-right, so the float result is bit-identical
#                      to the unsalted path.
#   funnel_counts_salted  the greedy walk is a finite state machine whose
#                      cross-block state is JUST the step index (any event
#                      of a later block is strictly later than any event
#                      of an earlier one, so the (ts,id) tie-break never
#                      crosses blocks). Each (user, block) task computes
#                      the block's full transition vector f: entry-step ->
#                      exit-step; a per-user pass composes the vectors in
#                      block order. Per-user phase-2 data = one small row
#                      per non-empty block, never the events.
#
# Equivalence with the unsalted operators (including salt_us < gap_us,
# which chains merges across many blocks) is pytest-verified on random
# streams, and both salted entries ship with the SAME DuckDB oracles as
# their unsalted twins — the driver proves the scale path hash-exact.


def sessionize_salted(
    ds: ray.data.Dataset,
    *,
    gap_us: int = 1_800_000_000,
    salt_us: int = 21_600_000_000,
    ts_column: str = "ts",
    user_column: str = "user_id",
    value_column: str = "value",
    id_column: str = "event_id",
) -> ray.data.Dataset:
    """sessionize() with the hot-user bound removed: identical output,
    but no task ever holds more than one (user, ts//salt_us) block."""
    if salt_us < 1:
        raise ValueError("salt_us must be >= 1")

    def add_block(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_column).cast(pa.int64()).to_numpy()
        return batch.append_column(
            "_blk", pa.array(us // salt_us, type=pa.int64())
        )

    def local_sessions(group: pa.Table) -> pa.Table:
        t = group.sort_by([(ts_column, "ascending"), (id_column, "ascending")])
        us = t.column(ts_column).cast(pa.int64()).to_numpy()
        vals = t.column(value_column).cast(pa.float64()).to_numpy()
        brk = np.ones(us.size, dtype=np.int64)
        if us.size > 1:
            brk[1:] = (us[1:] - us[:-1] > gap_us).astype(np.int64)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], us.size)
        m = starts.size
        uid = t.column(user_column)[0].as_py()
        blk = t.column("_blk")[0].as_py()
        return pa.table(
            {
                "user_id": pa.array(np.full(m, uid), type=pa.int64()),
                "_blk": pa.array(np.full(m, blk), type=pa.int64()),
                "ordinal": pa.array(np.arange(1, m + 1), type=pa.int64()),
                "n_local": pa.array(np.full(m, m), type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                # UNROUNDED session sums (reduceat = left-to-right, same
                # accumulation order as the unsalted path)
                "raw_sum": pa.array(np.add.reduceat(vals, starts), type=pa.float64()),
                "start_us": pa.array(us[starts], type=pa.int64()),
                "last_us": pa.array(us[ends - 1], type=pa.int64()),
            }
        )

    local = (
        ds.map_batches(add_block, batch_format="pyarrow")
        .groupby([user_column, "_blk"])
        .map_groups(local_sessions, batch_format="pyarrow")
        # consumed twice below (boundary walk + interior join); the rows
        # are per-SESSION summaries — i.e. output-sized, not event-sized —
        # so this is the one materialization the two-pass algorithm pays
        .materialize()
    )

    def keep_boundary(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        o = batch.column("ordinal")
        n = batch.column("n_local")
        return batch.filter(
            pc.or_(pc.equal(o, 1), pc.equal(o, n))
        )

    def walk(group: pa.Table) -> pa.Table:
        t = group.sort_by([("_blk", "ascending"), ("ordinal", "ascending")])
        blks = t.column("_blk").to_numpy()
        ordn = t.column("ordinal").to_numpy()
        nloc = t.column("n_local").to_numpy()
        nev = t.column("n_events").to_numpy()
        rsum = t.column("raw_sum").to_numpy()
        sus = t.column("start_us").to_numpy()
        lus = t.column("last_us").to_numpy()
        uid = t.column("user_id")[0].as_py()

        # rows per block: ordinal==1 first, then ordinal==n_local (same
        # row when n_local==1)
        kind, c1, c2, c3, c4, c5 = [], [], [], [], [], []

        def emit_final(sid, n, s, start):
            kind.append(0)
            c1.append(sid)
            c2.append(n)
            c3.append(s)
            c4.append(start)
            c5.append(0)

        def emit_offset(blk, off, consumed_first):
            kind.append(1)
            c1.append(blk)
            c2.append(off)
            c3.append(0.0)
            c4.append(0)
            c5.append(1 if consumed_first else 0)

        next_id = 1
        open_s = None  # [n_events, raw_sum, start_us, last_us]
        i = 0
        nrows = len(blks)
        while i < nrows:
            blk = blks[i]
            first = i
            last = i + 1 if (i + 1 < nrows and blks[i + 1] == blk) else i
            n = int(nloc[first])
            f_n, f_sum = int(nev[first]), float(rsum[first])
            f_start, f_last = int(sus[first]), int(lus[first])
            l_n, l_sum = int(nev[last]), float(rsum[last])
            l_start, l_last = int(sus[last]), int(lus[last])
            merged = open_s is not None and f_start - open_s[3] <= gap_us
            if merged:
                open_s[0] += f_n
                open_s[1] += f_sum
                open_s[3] = f_last
                if n == 1:
                    emit_offset(blk, 0, True)
                else:
                    emit_final(next_id, open_s[0], open_s[1], open_s[2])
                    emit_offset(blk, next_id - 1, True)
                    next_id += 1 + max(0, n - 2)
                    open_s = [l_n, l_sum, l_start, l_last]
            else:
                if open_s is not None:
                    emit_final(next_id, open_s[0], open_s[1], open_s[2])
                    next_id += 1
                if n == 1:
                    emit_offset(blk, 0, True)
                    open_s = [f_n, f_sum, f_start, f_last]
                else:
                    emit_offset(blk, next_id - 1, False)
                    next_id += n - 1
                    open_s = [l_n, l_sum, l_start, l_last]
            i = last + 1
        if open_s is not None:
            emit_final(next_id, open_s[0], open_s[1], open_s[2])
        return pa.table(
            {
                "kind": pa.array(kind, type=pa.int64()),
                "user_id": pa.array(np.full(len(kind), uid), type=pa.int64()),
                "a": pa.array(c1, type=pa.int64()),  # final: sid / offset: blk
                "b": pa.array(c2, type=pa.int64()),  # final: n_events / offset
                "s": pa.array(c3, type=pa.float64()),  # final: raw sum
                "t": pa.array(c4, type=pa.int64()),  # final: start_us
                "cf": pa.array(c5, type=pa.int64()),  # offset: consumed_first
            }
        )

    phase2 = (
        local.map_batches(keep_boundary, batch_format="pyarrow")
        .groupby(user_column)
        .map_groups(walk, batch_format="pyarrow")
    )

    def to_joinable(batch: pa.Table) -> pa.Table:
        """Normalize phase-2 rows into the (user, _blk)-keyed join schema.
        Finals get _blk = -1 - session_id (a unique pass-through key: no
        real block is negative, so they never meet an offset row)."""
        import pyarrow.compute as pc

        kind = batch.column("kind").to_numpy()
        a = batch.column("a").to_numpy()
        blk = np.where(kind == 0, -1 - a, a)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "_blk": pa.array(blk, type=pa.int64()),
                "kind": batch.column("kind"),
                "a": batch.column("a"),
                "b": batch.column("b"),
                "s": batch.column("s"),
                "t": batch.column("t"),
                "cf": batch.column("cf"),
                "ordinal": pa.array(np.zeros(len(kind), dtype=np.int64)),
                "n_local": pa.array(np.zeros(len(kind), dtype=np.int64)),
            }
        )

    def interior_joinable(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "_blk": batch.column("_blk"),
                "kind": pa.array(np.full(n, 2, dtype=np.int64)),
                "a": pa.array(np.zeros(n, dtype=np.int64)),
                "b": batch.column("n_events"),
                "s": batch.column("raw_sum"),
                "t": batch.column("start_us"),
                "cf": pa.array(np.zeros(n, dtype=np.int64)),
                "ordinal": batch.column("ordinal"),
                "n_local": batch.column("n_local"),
            }
        )

    unioned = phase2.map_batches(to_joinable, batch_format="pyarrow").union(
        local.map_batches(interior_joinable, batch_format="pyarrow")
    )

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy()
        uid = group.column("user_id")[0].as_py()
        out_sid, out_n, out_sum, out_start = [], [], [], []
        finals = np.flatnonzero(kind == 0)
        for j in finals:
            out_sid.append(int(group.column("a")[j].as_py()))
            out_n.append(int(group.column("b")[j].as_py()))
            out_sum.append(float(group.column("s")[j].as_py()))
            out_start.append(int(group.column("t")[j].as_py()))
        off_rows = np.flatnonzero(kind == 1)
        if off_rows.size:
            off = int(group.column("b")[off_rows[0]].as_py())
            consumed_first = bool(group.column("cf")[off_rows[0]].as_py())
            ints = np.flatnonzero(kind == 2)
            if ints.size:
                o = group.column("ordinal").to_numpy()[ints]
                nl = group.column("n_local").to_numpy()[ints]
                keep = (o != nl) & ~((o == 1) & consumed_first)
                for j, k in zip(ints[keep], o[keep]):
                    out_sid.append(off + int(k))
                    out_n.append(int(group.column("b")[j].as_py()))
                    out_sum.append(float(group.column("s")[j].as_py()))
                    out_start.append(int(group.column("t")[j].as_py()))
        return pa.table(
            {
                "user_id": pa.array(
                    np.full(len(out_sid), uid), type=pa.int64()
                ),
                "session_id": pa.array(out_sid, type=pa.int64()),
                "n_events": pa.array(out_n, type=pa.int64()),
                "sum_value": pa.array(
                    np.round(np.array(out_sum, dtype=np.float64), 6),
                    type=pa.float64(),
                ),
                "start_us": pa.array(out_start, type=pa.int64()),
            }
        )

    return unioned.groupby([user_column, "_blk"]).map_groups(
        resolve, batch_format="pyarrow"
    )


def funnel_counts_salted(
    ds: "ray.data.Dataset",
    steps: "tuple[str, ...]",
    *,
    salt_us: int = 21_600_000_000,
    user_column: str = "user_id",
    type_column: str = "event_type",
    ts_column: str = "ts",
    id_column: str = "event_id",
) -> "ray.data.Dataset":
    """funnel_counts() with the hot-user bound removed via state-machine
    composition: per (user, time-block) transition vectors, composed per
    user in block order. Identical output."""
    import pyarrow.compute as pc

    if salt_us < 1:
        raise ValueError("salt_us must be >= 1")
    nsteps = len(steps)
    step_of = {s: i for i, s in enumerate(steps)}

    def add_block(batch: pa.Table) -> pa.Table:
        us = pc.cast(
            pc.cast(batch.column(ts_column), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_blk", pa.array(us // salt_us, type=pa.int64())
        )

    def block_transitions(group: pa.Table) -> pa.Table:
        uid = group.column(user_column)[0].as_py()
        blk = group.column("_blk")[0].as_py()
        ts_us = pc.cast(group.column(ts_column), pa.timestamp("us")).cast(pa.int64())
        ts_us = ts_us.to_numpy(zero_copy_only=False)
        eid = group.column(id_column).to_numpy(zero_copy_only=False)
        types = group.column(type_column).to_pylist()
        order = np.lexsort((eid, ts_us))
        tcodes = np.array(
            [step_of.get(t, -1) for t in types], dtype=np.int64
        )[order]
        idx = [np.flatnonzero(tcodes == si) for si in range(nsteps)]
        trans = np.empty(nsteps + 1, dtype=np.int64)
        for s in range(nsteps + 1):
            cur = -1
            reached = s
            for si in range(s, nsteps):
                arr = idx[si]
                j = np.searchsorted(arr, cur + 1)
                if j >= arr.size:
                    break
                cur = int(arr[j])
                reached = si + 1
            trans[s] = reached
        cols = {
            "user_id": pa.array([uid], type=pa.int64()),
            "_blk": pa.array([blk], type=pa.int64()),
        }
        for s in range(nsteps + 1):
            cols[f"f{s}"] = pa.array([int(trans[s])], type=pa.int64())
        return pa.table(cols)

    per_block = (
        ds.map_batches(add_block, batch_format="pyarrow")
        .groupby([user_column, "_blk"])
        .map_groups(block_transitions, batch_format="pyarrow")
    )

    def compose(group: pa.Table) -> pa.Table:
        t = group.sort_by([("_blk", "ascending")])
        uid = t.column(user_column)[0].as_py()
        fs = np.stack(
            [t.column(f"f{s}").to_numpy() for s in range(nsteps + 1)], axis=1
        )
        s = 0
        for r in range(fs.shape[0]):
            s = int(fs[r, s])
        return pa.table(
            {
                "user_id": pa.array([uid], type=pa.int64()),
                "reached": pa.array([s], type=pa.int64()),
            }
        )

    per = per_block.groupby(user_column).map_groups(
        compose, batch_format="pyarrow"
    )

    def expand(batch: pa.Table) -> pa.Table:
        r = batch.column("reached").to_numpy(zero_copy_only=False)
        out_step = list(range(1, nsteps + 1))
        out_n = [int((r >= si).sum()) for si in out_step]
        return pa.table(
            {
                "step": pa.array(out_step, type=pa.int64()),
                "n_users": pa.array(out_n, type=pa.int64()),
            }
        )

    agg = (
        per.map_batches(expand, batch_format="pyarrow")
        .groupby("step")
        .sum("n_users")
        .rename_columns({"sum(n_users)": "n_users"})
    )

    def label(batch: pa.Table) -> pa.Table:
        s = batch.column("step").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "event_type",
            pa.array([steps[i - 1] for i in s], type=pa.string()),
        )

    return agg.map_batches(label, batch_format="pyarrow")
