"""Query-time joins (JoinUtil analog) over Ray Datasets."""

import pyarrow as pa
import ray.data

from lucene_net_ray.pipelines.joins import block_join_parents, semi_join


def _tables():
    cust = ray.data.from_items(
        [{"custkey": i, "nation": i % 3} for i in range(9)]
    )
    orders = ray.data.from_items(
        [{"orderkey": 100 + i, "custkey": i % 6} for i in range(12)]
    )
    return cust, orders


def test_semi_join():
    cust, orders = _tables()
    nation1 = cust.filter(expr="nation == 1")  # custkeys 1, 4, 7
    got = semi_join(orders, "custkey", nation1, "custkey").take_all()
    assert sorted(r["orderkey"] for r in got) == sorted(
        100 + i for i in range(12) if (i % 6) in (1, 4)
    )


def test_anti_join():
    cust, orders = _tables()
    got = semi_join(cust, "custkey", orders, "custkey", negate=True).take_all()
    # orders reference custkeys 0..5 -> customers 6,7,8 are orphans
    assert sorted(r["custkey"] for r in got) == [6, 7, 8]


def test_block_join_parents():
    rows = []
    for parent in range(4):
        for child in range(3):
            rows.append({"parent": parent, "val": parent * 10 + child})
    ds = ray.data.from_items(rows)
    # keep blocks where ANY child has val % 10 == 2 (all of them) vs a
    # selective predicate (only parent 2 has a val == 22)
    out = block_join_parents(
        ds, parent_key="parent",
        child_match=lambda g: pa.compute.equal(g.column("val"), 22),
    ).take_all()
    assert sorted(r["val"] for r in out) == [20, 21, 22]
    out_all = block_join_parents(
        ds, parent_key="parent",
        child_match=lambda g: pa.compute.greater_equal(g.column("val"), 10),
        mode="all",
    ).take_all()
    assert {r["parent"] for r in out_all} == {1, 2, 3}
