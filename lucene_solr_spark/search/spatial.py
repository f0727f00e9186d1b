"""Geo-spatial queries: bounding-box, point-radius, and k-nearest.

Re-expresses the reference's sandbox geo query family
(`lucene/sandbox/src/java/org/apache/lucene/search/GeoPointInBBoxQuery.java`,
`GeoPointDistanceQuery.java`) and its haversine distance
(`lucene/core/src/java/org/apache/lucene/util/SloppyMath.java:44-56`)
Spark-first:

- **Box query** = a pure range predicate on the lat/lon columns. When
  the coordinates are stored table columns this is a parquet
  min/max-pruned pushed-down filter (the analog of the reference's
  morton-code term ranges); a dateline-crossing box (minLon > maxLon)
  splits into an OR of two lon ranges, exactly as
  `GeoPointInBBoxQuery.rewrite` splits into two boxes
  (`GeoPointInBBoxQuery.java:78-92`).
- **Distance query** = the reference's two-phase shape
  (`GeoPointDistanceQuery.java:26-31`): a cheap conservative
  bounding-box prefilter (range predicate, pushdown-eligible) and an
  exact haversine verify on the survivors. The prefilter is
  correctness-neutral (strictly conservative), so at 100 TB the scan
  touches only row groups whose lat/lon min/max intersect the circle's
  bbox while results stay exact.
- **k-nearest** = haversine distance + `TakeOrderedAndProject`
  (per-partition top-k, merge on the driver-side heap — the same
  two-level collect as TopDocs.merge), analog of
  `LatLonPoint.nearest`-style search.

Deviation (documented): distances use the R.W. Sinnott haversine with
the IUGG mean earth radius (6,371,008.7714 m) instead of SloppyMath's
latitude-dependent earth diameter (`SloppyMath.java:49-52`) — same
accuracy class (the reference itself documents ~400 m error at large
radii); a fixed radius keeps the formula a pure composition of
built-in column expressions reproducible bit-for-bit in the DuckDB
oracle (double arithmetic in an identical operation order, float32
cast at the surface).

All expressions are built-in Column functions — no UDFs, fully inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# IUGG mean earth radius, metres.
EARTH_RADIUS_M = 6371008.7714
# double literal of pi/180; multiplying by it (ONE IEEE op) is
# reproduced exactly in the oracle SQL, unlike Math.toRadians' two-op
# x/180*PI vs libm radians' one-op x*(pi/180).
DEG_TO_RAD = 0.017453292519943295


def _rad(col: Column) -> Column:
    return col * F.lit(DEG_TO_RAD)


def haversine_m(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in metres (Sinnott haversine,
    `SloppyMath.haversin` analog with fixed mean radius).

    Operation order is pinned — the DuckDB oracle mirrors it
    term-for-term so the doubles agree to the last few ulps and the
    float32 surface cast is bit-identical.
    """
    rlat1, rlat2 = _rad(lat1), _rad(lat2)
    s1 = F.sin((rlat2 - rlat1) * F.lit(0.5))
    s2 = F.sin((_rad(lon2) - _rad(lon1)) * F.lit(0.5))
    h = s1 * s1 + F.cos(rlat1) * F.cos(rlat2) * (s2 * s2)
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def box_predicate(
    lat: Column,
    lon: Column,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> Column:
    """GeoPointInBBoxQuery analog: a pure range predicate.

    `min_lon > max_lon` means the box crosses the dateline and splits
    into two lon ranges OR-ed together
    (`GeoPointInBBoxQuery.java:78-92`).
    """
    lat_ok = (lat >= F.lit(min_lat)) & (lat <= F.lit(max_lat))
    if min_lon > max_lon:  # dateline crossing
        lon_ok = (lon >= F.lit(min_lon)) | (lon <= F.lit(max_lon))
    else:
        lon_ok = (lon >= F.lit(min_lon)) & (lon <= F.lit(max_lon))
    return lat_ok & lon_ok


def distance_bbox(
    center_lat: float, center_lon: float, radius_m: float
) -> tuple[float, float, float, float]:
    """Conservative bounding box around a point-radius circle
    (`GeoPointDistanceQuery.computeBBox` analog). Strictly a superset
    of the circle: 0.1% margin on the angular radius, lon half-width
    from the widest-|lat| edge of the box, full wrap near the poles."""
    import math

    ang = math.degrees(radius_m / EARTH_RADIUS_M) * 1.001
    min_lat = max(-90.0, center_lat - ang)
    max_lat = min(90.0, center_lat + ang)
    edge_lat = min(89.9, max(abs(min_lat), abs(max_lat)))
    if edge_lat >= 89.9 or ang >= 90.0:
        return min_lat, max_lat, -180.0, 180.0
    lon_w = ang / math.cos(math.radians(edge_lat))
    if lon_w >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    min_lon, max_lon = center_lon - lon_w, center_lon + lon_w
    # wrap across the dateline -> split-box encoding (min > max)
    if min_lon < -180.0:
        min_lon += 360.0
    if max_lon > 180.0:
        max_lon -= 360.0
    return min_lat, max_lat, min_lon, max_lon


def distance_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    dist_col: str = "dist_m",
) -> DataFrame:
    """Two-phase point-radius query (`GeoPointDistanceQuery` shape):
    conservative bbox range predicate first (pushdown-eligible — at
    scale this is the partition/row-group pruning step), exact
    haversine verify second. Returns the matching rows plus the
    distance column (double metres)."""
    la, lo = F.col(lat_col), F.col(lon_col)
    b = distance_bbox(center_lat, center_lon, radius_m)
    pre = df.filter(box_predicate(la, lo, b[0], b[1], b[2], b[3]))
    d = haversine_m(F.lit(center_lat), F.lit(center_lon), la, lo)
    return pre.withColumn(dist_col, d).filter(
        F.col(dist_col) <= F.lit(radius_m)
    )


def nearest(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    center_lat: float,
    center_lon: float,
    k: int,
    id_col: str,
    dist_col: str = "dist_m",
) -> DataFrame:
    """k-nearest by haversine distance (LatLonPoint.nearest analog):
    distance expression + orderBy + limit — Spark plans this as
    TakeOrderedAndProject (per-partition top-k, merged), the same
    two-level collect as the engine's TopDocs.merge. Tie-break:
    distance asc (float32 surface), id asc."""
    la, lo = F.col(lat_col), F.col(lon_col)
    d = haversine_m(F.lit(center_lat), F.lit(center_lon), la, lo)
    return (
        df.withColumn(dist_col, d.cast("float"))
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k)
    )


def polygon_predicate(
    lat: Column,
    lon: Column,
    poly_lats: list[float],
    poly_lons: list[float],
) -> Column:
    """GeoPointInPolygonQuery verify phase: the reference's even-odd
    crossing test on raw degrees (`GeoUtils.pointInPolygon`,
    `lucene/sandbox/.../util/GeoUtils.java:127-143` — euclidean
    coordinate treatment, same documented accuracy caveat). The
    polygon must be closed (first vertex == last). Fixed vertices
    unroll into a fixed `when()` indicator per edge summed and tested
    for odd parity — a pure codegen expression tree, no UDF."""
    assert len(poly_lats) == len(poly_lons) >= 4
    assert poly_lats[0] == poly_lats[-1] and poly_lons[0] == poly_lons[-1]
    crossings: Column | None = None
    for i in range(1, len(poly_lons)):
        x_i, x_p = poly_lons[i], poly_lons[i - 1]
        y_i, y_p = poly_lats[i], poly_lats[i - 1]
        straddle = ((F.lit(x_i) < lon) & (F.lit(x_p) >= lon)) | (
            (F.lit(x_p) < lon) & (F.lit(x_i) >= lon)
        )
        # edge's latitude at the point's longitude, reference op order
        edge_lat = F.lit(y_i) + (lon - F.lit(x_i)) / F.lit(x_p - x_i) * F.lit(
            y_p - y_i
        )
        ind = F.when(straddle & (edge_lat < lat), 1).otherwise(0)
        crossings = ind if crossings is None else crossings + ind
    return crossings % 2 == 1


def polygon_sql(
    lat_expr: str,
    lon_expr: str,
    poly_lats: list[float],
    poly_lons: list[float],
) -> str:
    """`polygon_predicate` as SQL text (same op order) for the oracle."""
    terms = []
    for i in range(1, len(poly_lons)):
        x_i, x_p = poly_lons[i], poly_lons[i - 1]
        y_i, y_p = poly_lats[i], poly_lats[i - 1]
        straddle = (
            f"(({x_i!r} < {lon_expr} AND {x_p!r} >= {lon_expr}) OR "
            f"({x_p!r} < {lon_expr} AND {x_i!r} >= {lon_expr}))"
        )
        edge_lat = (
            f"({y_i!r} + ({lon_expr} - {x_i!r}) / {x_p - x_i!r} * "
            f"{y_p - y_i!r})"
        )
        terms.append(
            f"CASE WHEN {straddle} AND {edge_lat} < {lat_expr} "
            "THEN 1 ELSE 0 END"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def polygon_query(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    poly_lats: list[float],
    poly_lons: list[float],
) -> DataFrame:
    """Two-phase polygon query (`GeoPointInPolygonQuery` shape): the
    polygon's bounding box as a pushdown-eligible range prefilter,
    then the exact even-odd verify."""
    la, lo = F.col(lat_col), F.col(lon_col)
    pre = df.filter(
        box_predicate(
            la,
            lo,
            min(poly_lats),
            max(poly_lats),
            min(poly_lons),
            max(poly_lons),
        )
    )
    return pre.filter(polygon_predicate(la, lo, poly_lats, poly_lons))


# ----------------------------------------------------------------------
# deterministic fixture coordinates
# ----------------------------------------------------------------------
# The driver's test tables carry no geo columns, so contract entries
# derive a deterministic point per document from its BIGINT id with
# pure integer arithmetic (exact in both engines) followed by ONE
# double division. A real deployment indexes stored lat/lon columns —
# everything above operates on arbitrary Column expressions.

LAT_MUL, LAT_ADD, LAT_MOD = 9973, 12345, 1800001
LON_MUL, LON_ADD, LON_MOD = 7919, 54321, 3600001


def derived_point(id_col: Column) -> tuple[Column, Column]:
    lat = ((id_col * LAT_MUL + LAT_ADD) % LAT_MOD) / F.lit(10000.0) - F.lit(
        90.0
    )
    lon = ((id_col * LON_MUL + LON_ADD) % LON_MOD) / F.lit(10000.0) - F.lit(
        180.0
    )
    return lat, lon


def derived_point_sql(id_expr: str) -> tuple[str, str]:
    """The same derivation as ANSI SQL for the DuckDB oracle."""
    lat = f"((({id_expr}) * {LAT_MUL} + {LAT_ADD}) % {LAT_MOD}) / 10000.0 - 90.0"
    lon = f"((({id_expr}) * {LON_MUL} + {LON_ADD}) % {LON_MOD}) / 10000.0 - 180.0"
    return lat, lon


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Haversine as SQL text in the SAME operation order as
    `haversine_m` (term-for-term), for the DuckDB oracle."""
    rl1 = f"(({lat1}) * {DEG_TO_RAD!r})"
    rl2 = f"(({lat2}) * {DEG_TO_RAD!r})"
    s1 = f"sin(({rl2} - {rl1}) * 0.5)"
    s2 = f"sin(((({lon2}) * {DEG_TO_RAD!r}) - (({lon1}) * {DEG_TO_RAD!r})) * 0.5)"
    h = f"({s1} * {s1} + cos({rl1}) * cos({rl2}) * ({s2} * {s2}))"
    return f"({2.0 * EARTH_RADIUS_M!r} * asin(least(1.0, sqrt({h}))))"


# ----------------------------------------------------------------------
# heatmap facet
# ----------------------------------------------------------------------


def heatmap_facet(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    grid_rows: int,
    grid_cols: int,
) -> DataFrame:
    """Solr facet.heatmap analog (HeatmapFacetCounter,
    lucene/spatial-extras/src/java/org/apache/lucene/spatial/prefix/
    HeatmapFacetCounter.java:60-120 + solr/core/.../component/
    SpatialHeatmapFacets.java): per-grid-cell document counts over a
    bounding box at a fixed grid resolution.

    Spark mapping: cell id = floor((coord - min) / cell_size), clamped
    so the exact max edge lands in the last cell (the reference's
    grid snap keeps the box edge inclusive); ONE groupBy on
    (grid_row, grid_col) — a single shuffle on at most rows*cols keys,
    map-side combined, skew-free by construction. The box predicate is
    a pushdown-eligible range filter (partition/row-group pruning on
    stored lat/lon at scale). Empty cells are absent (sparse output —
    the reference emits dense int arrays; callers can densify with a
    literal grid cross join when needed).

    Returns (grid_row, grid_col, cnt) sorted by (grid_row, grid_col).
    grid_row counts up from min_lat (south), grid_col from min_lon
    (west). Cell sizes are Python-double literals, so the oracle's
    arithmetic matches bit-for-bit."""
    assert max_lat > min_lat and max_lon > min_lon
    cell_h = (max_lat - min_lat) / float(grid_rows)
    cell_w = (max_lon - min_lon) / float(grid_cols)
    la, lo = F.col(lat_col), F.col(lon_col)
    pred = box_predicate(la, lo, min_lat, max_lat, min_lon, max_lon)
    row = F.least(
        F.floor((la - F.lit(min_lat)) / F.lit(cell_h)),
        F.lit(grid_rows - 1),
    ).cast("long")
    col = F.least(
        F.floor((lo - F.lit(min_lon)) / F.lit(cell_w)),
        F.lit(grid_cols - 1),
    ).cast("long")
    return (
        df.filter(pred)
        .groupBy(row.alias("grid_row"), col.alias("grid_col"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy("grid_row", "grid_col")
    )


def heatmap_facet_sql(
    lat_expr: str,
    lon_expr: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    grid_rows: int,
    grid_cols: int,
    from_clause: str,
) -> str:
    """`heatmap_facet` as SQL text (same op order) for the oracle."""
    cell_h = (max_lat - min_lat) / float(grid_rows)
    cell_w = (max_lon - min_lon) / float(grid_cols)
    pred = (
        f"({lat_expr}) >= {min_lat!r} AND ({lat_expr}) <= {max_lat!r} "
        f"AND ({lon_expr}) >= {min_lon!r} AND ({lon_expr}) <= {max_lon!r}"
    )
    row = (
        f"CAST(least(floor((({lat_expr}) - {min_lat!r}) / {cell_h!r}), "
        f"{grid_rows - 1}) AS BIGINT)"
    )
    col = (
        f"CAST(least(floor((({lon_expr}) - {min_lon!r}) / {cell_w!r}), "
        f"{grid_cols - 1}) AS BIGINT)"
    )
    return (
        f"SELECT {row} AS grid_row, {col} AS grid_col, "
        f"count(*)::BIGINT AS cnt {from_clause} WHERE {pred} "
        "GROUP BY 1, 2 ORDER BY grid_row, grid_col"
    )
