"""Geo filters (PointVectorStrategy analog): bbox must never cut a true
radius match (the cap-bulge case), distance filter == brute force, nearest_k
reduce."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_net_ray.stages.spatial import (
    _bbox_for_radius,
    bbox_filter,
    distance_filter,
    haversine_km,
    nearest_k,
)


def _grid(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.9, 89.9, n)
    lon = rng.uniform(-179.9, 179.9, n)
    return pa.table({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})


def test_haversine_known_distances():
    # SF -> NYC ~ 4130 km; identical points -> 0; antipodal ~ half circumference
    d = float(haversine_km(37.77, -122.42, 40.71, -74.01))
    assert 4120 < d < 4145
    assert float(haversine_km(10.0, 20.0, 10.0, 20.0)) == 0.0
    anti = float(haversine_km(0.0, 0.0, 0.0, 180.0))
    assert abs(anti - np.pi * 6371.0088) < 1.0


@pytest.mark.parametrize("radius", [50, 500, 6000, 15000])
def test_distance_filter_equals_brute_force(radius):
    """The bbox pre-filter must be lossless: result set identical to pure
    haversine filtering (large radii exercise the cap-bulge longitude
    width; radius > quarter-circumference degenerates to full lon range)."""
    t = _grid()
    ds = ray.data.from_arrow(t)
    out = distance_filter(
        ds, lat_column="lat", lon_column="lon",
        center_lat=48.85, center_lon=2.35, radius_km=radius,
    ).to_pandas()
    d = haversine_km(t.column("lat").to_numpy(), t.column("lon").to_numpy(), 48.85, 2.35)
    expect = set(np.asarray(t.column("id"))[d <= radius].tolist())
    if len(out) == 0:
        assert expect == set()  # Ray drops the schema on empty to_pandas
        return
    assert set(out["id"]) == expect
    # returned distances agree with the direct computation
    got = out.set_index("id")["distance_km"]
    for i in list(expect)[:50]:
        assert got[i] == pytest.approx(float(d[i]), abs=1e-9)


def test_bbox_contains_cap():
    # property: every point within radius lies inside the computed bbox
    rng = np.random.default_rng(3)
    for _ in range(20):
        clat = float(rng.uniform(-85, 85)); clon = float(rng.uniform(-170, 170))
        r = float(rng.uniform(10, 9000))
        lo_lat, hi_lat, lo_lon, hi_lon = _bbox_for_radius(clat, clon, r)
        pts_lat = rng.uniform(-90, 90, 4000); pts_lon = rng.uniform(-180, 180, 4000)
        d = haversine_km(pts_lat, pts_lon, clat, clon)
        inside = d <= r
        # ignore dateline wrap cases (documented out of scope)
        if lo_lon < -180 or hi_lon > 180:
            continue
        assert (pts_lat[inside] >= lo_lat - 1e-9).all() and (pts_lat[inside] <= hi_lat + 1e-9).all()
        assert (pts_lon[inside] >= lo_lon - 1e-9).all() and (pts_lon[inside] <= hi_lon + 1e-9).all()


def test_bbox_filter_inclusive():
    t = pa.table({"id": [1, 2, 3], "lat": [10.0, 20.0, 30.0], "lon": [0.0, 5.0, 10.0]})
    out = bbox_filter(
        ray.data.from_arrow(t), lat_column="lat", lon_column="lon",
        min_lat=10.0, max_lat=20.0, min_lon=0.0, max_lon=5.0,
    ).to_pandas()
    assert set(out["id"]) == {1, 2}


def test_nearest_k():
    t = _grid(500)
    rows = nearest_k(
        ray.data.from_arrow(t), lat_column="lat", lon_column="lon",
        id_column="id", center_lat=0.0, center_lon=0.0, k=5,
    )
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    d = haversine_km(t.column("lat").to_numpy(), t.column("lon").to_numpy(), 0.0, 0.0)
    expect = np.asarray(t.column("id"))[np.lexsort((np.asarray(t.column("id")), d))[:5]]
    assert [r["id"] for r in rows] == expect.tolist()
    assert rows[0]["distance_km"] <= rows[-1]["distance_km"]


@pytest.mark.parametrize("radius", [100, 1000, 4000])
def test_distance_join_exact_vs_brute(radius):
    """distance_join_pairs must equal the O(n^2) haversine join exactly —
    the 9-cell emission guarantees any within-radius pair shares a cell."""
    from lucene_net_ray.stages.spatial import distance_join_pairs

    rng = np.random.default_rng(11)
    n = 400
    lat = rng.uniform(-79.5, 79.5, n)
    lon = rng.uniform(-179.9, 179.9, n)
    t = pa.table({"id": np.arange(n, dtype=np.int64), "lat": lat, "lon": lon})
    out = distance_join_pairs(
        ray.data.from_arrow(t), lat_column="lat", lon_column="lon",
        id_column="id", radius_km=radius,
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["id_a"], out["id_b"])}
    iu, ju = np.triu_indices(n, 1)
    d = haversine_km(lat[iu], lon[iu], lat[ju], lon[ju])
    expect = {(int(iu[i]), int(ju[i])) for i in np.flatnonzero(d <= radius)}
    assert got == expect, (len(got), len(expect), radius)
    # distances faithful
    if len(out):
        dm = {(int(a), int(b)): dv for a, b, dv in zip(out.id_a, out.id_b, out.distance_km)}
        pairs_d = {(int(iu[i]), int(ju[i])): float(d[i]) for i in np.flatnonzero(d <= radius)}
        for kpair in list(expect)[:50]:
            assert dm[kpair] == pytest.approx(pairs_d[kpair], abs=1e-9)


def test_distance_join_rejects_polar():
    from lucene_net_ray.stages.spatial import distance_join_pairs

    t = pa.table({"id": [1, 2], "lat": [85.0, 10.0], "lon": [0.0, 0.0]})
    import pytest as _p
    with _p.raises(Exception):
        distance_join_pairs(
            ray.data.from_arrow(t), lat_column="lat", lon_column="lon",
            id_column="id", radius_km=100.0,
        ).materialize()
