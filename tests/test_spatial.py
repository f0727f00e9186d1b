"""Spatial query tests: bbox (incl. dateline split), two-phase
distance query vs brute-force haversine, k-nearest ordering, and the
pushdown story for stored lat/lon columns."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search import spatial as sp

from .conftest import SF_SMALL


def _geo(spark):
    d = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        F.col("doc_id").cast("long")
    )
    lat, lon = sp.derived_point(F.col("doc_id"))
    return d.withColumn("lat", lat).withColumn("lon", lon)


def _brute(rows, clat, clon):
    R = sp.EARTH_RADIUS_M
    out = {}
    for r in rows:
        rl1, rl2 = math.radians(clat), math.radians(r.lat)
        s1 = math.sin((rl2 - rl1) * 0.5)
        s2 = math.sin((math.radians(r.lon) - math.radians(clon)) * 0.5)
        h = s1 * s1 + math.cos(rl1) * math.cos(rl2) * (s2 * s2)
        out[r.doc_id] = 2.0 * R * math.asin(min(1.0, math.sqrt(h)))
    return out


def test_box_predicate_plain_and_dateline(spark):
    g = _geo(spark).cache()
    rows = g.collect()
    # plain box
    got = g.filter(
        sp.box_predicate(F.col("lat"), F.col("lon"), -60, 60, -120, 60)
    ).count()
    want = sum(1 for r in rows if -60 <= r.lat <= 60 and -120 <= r.lon <= 60)
    assert got == want and want > 0
    # dateline-crossing box: minLon > maxLon -> OR of two ranges
    got2 = g.filter(
        sp.box_predicate(F.col("lat"), F.col("lon"), -90, 90, 150, -150)
    ).count()
    want2 = sum(1 for r in rows if r.lon >= 150 or r.lon <= -150)
    assert got2 == want2 and 0 < want2 < len(rows)


def test_distance_query_two_phase_equals_brute(spark):
    g = _geo(spark)
    clat, clon, radius = 37.7749, -122.4194, 3_000_000.0
    hits = {
        r.doc_id: r.dist_m
        for r in sp.distance_query(g, "lat", "lon", clat, clon, radius)
        .select("doc_id", "dist_m")
        .collect()
    }
    brute = _brute(g.collect(), clat, clon)
    want = {k for k, v in brute.items() if v <= radius}
    assert set(hits) == want and len(want) > 0
    for k, v in hits.items():
        assert v == pytest.approx(brute[k], abs=1e-6)


def test_distance_bbox_is_conservative(spark):
    # every point inside the circle must fall inside the prefilter box,
    # including a center whose circle crosses the dateline
    for clat, clon in ((37.7749, -122.4194), (10.0, 179.5), (-85.0, 0.0)):
        radius = 3_000_000.0
        b = sp.distance_bbox(clat, clon, radius)
        g = _geo(spark)
        d = sp.haversine_m(
            F.lit(clat), F.lit(clon), F.col("lat"), F.col("lon")
        )
        inside = g.withColumn("d", d).filter(F.col("d") <= radius)
        escaped = inside.filter(
            ~sp.box_predicate(F.col("lat"), F.col("lon"), *b)
        ).count()
        assert escaped == 0


def test_nearest_ordering_and_k(spark):
    g = _geo(spark)
    clat, clon = 48.8566, 2.3522
    got = sp.nearest(g, "lat", "lon", clat, clon, 10, "doc_id").collect()
    brute = sorted(_brute(g.collect(), clat, clon).items(), key=lambda kv: (kv[1], kv[0]))
    assert [r.doc_id for r in got] == [k for k, _ in brute[:10]]
    dists = [r.dist_m for r in got]
    assert dists == sorted(dists)


def test_polygon_query_concave(spark):
    """Even-odd crossing test vs a verbatim-semantics brute force on a
    concave (notched) polygon; the notch must exclude bbox hits."""
    ys = [-40.0, 40.0, 40.0, -40.0, -40.0, 0.0, 0.0, -40.0, -40.0]
    xs = [-60.0, -60.0, 60.0, 60.0, 20.0, 20.0, -20.0, -20.0, -60.0]
    g = _geo(spark)
    got = {
        r.doc_id
        for r in sp.polygon_query(g, "lat", "lon", ys, xs).collect()
    }

    def inpoly(lat, lon):
        inp = False
        for i in range(1, len(xs)):
            if (xs[i] < lon <= xs[i - 1]) or (xs[i - 1] < lon <= xs[i]):
                if ys[i] + (lon - xs[i]) / (xs[i - 1] - xs[i]) * (
                    ys[i - 1] - ys[i]
                ) < lat:
                    inp = not inp
        return inp

    rows = g.collect()
    want = {r.doc_id for r in rows if inpoly(r.lat, r.lon)}
    in_bbox = {
        r.doc_id for r in rows if -40 <= r.lat <= 40 and -60 <= r.lon <= 60
    }
    assert got == want
    assert want < in_bbox  # concavity exercised


def test_stored_latlon_pushdown(spark, tmp_path):
    """With stored lat/lon columns, the bbox phase reaches the parquet
    scan as PushedFilters (the 100-TB pruning story)."""
    p = str(tmp_path / "geo_parquet")
    _geo(spark).write.mode("overwrite").parquet(p)
    stored = spark.read.parquet(p)
    q = sp.distance_query(stored, "lat", "lon", 37.7749, -122.4194, 3_000_000.0)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any(
        "GreaterThanOrEqual(lat" in ln and "LessThanOrEqual(lat" in ln
        for ln in pushed
    )


def test_heatmap_facet_grid(spark):
    g = _geo(spark).cache()
    got = sp.heatmap_facet(
        g, "lat", "lon", -40.0, 40.0, -60.0, 60.0, 8, 8
    ).collect()
    rows = g.collect()
    # brute-force the same grid
    want: dict[tuple[int, int], int] = {}
    for r in rows:
        if not (-40.0 <= r.lat <= 40.0 and -60.0 <= r.lon <= 60.0):
            continue
        gr = min(int(math.floor((r.lat - -40.0) / 10.0)), 7)
        gc = min(int(math.floor((r.lon - -60.0) / 15.0)), 7)
        want[(gr, gc)] = want.get((gr, gc), 0) + 1
    assert {(r.grid_row, r.grid_col): r.cnt for r in got} == want
    assert want, "fixture must populate the heatmap box"
    # sparse output: only occupied cells, all within the grid
    assert all(0 <= r.grid_row < 8 and 0 <= r.grid_col < 8 for r in got)
    # cell total == box-predicate total (grid partitions the box)
    box_n = g.filter(
        sp.box_predicate(F.col("lat"), F.col("lon"), -40, 40, -60, 60)
    ).count()
    assert sum(r.cnt for r in got) == box_n


def test_heatmap_max_edge_clamps_into_last_cell(spark):
    df = spark.createDataFrame(
        [(1, 40.0, 60.0), (2, -40.0, -60.0)], "doc_id long, lat double, lon double"
    )
    got = {
        (r.grid_row, r.grid_col): r.cnt
        for r in sp.heatmap_facet(
            df, "lat", "lon", -40.0, 40.0, -60.0, 60.0, 8, 8
        ).collect()
    }
    assert got == {(7, 7): 1, (0, 0): 1}
