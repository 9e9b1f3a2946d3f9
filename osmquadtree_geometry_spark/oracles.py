"""DuckDB oracle SQL generators for the geometry pipeline.

These produce *independent* re-derivations of each operator's result
in DuckDB dialect, straight from the raw ``docs`` fixture parquet.
The driver runs them side-by-side with the Spark queries
(CORRECTNESS gate); because they share no code with the Spark path
(different dialect, different formulation), agreement is strong
evidence of correctness.

Column names/aliases must match the Spark side exactly.
"""

from __future__ import annotations

from .config.minzoom import MinZoomSpec
from .config.style import GeometryStyle
from .kernels.mercator import EARTH_WIDTH
from .kernels.quadtree import (sql_point_qt, sql_qt_depth, sql_round_qt,
                               sql_tile_qt)


def _lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def base_ctes(docs_path: str) -> str:
    """Shared CTEs: spans / nodes / way refs / rel members / tags."""
    return f"""
sp AS (SELECT doc_id, unnest(spans) AS s FROM read_parquet({_lit(docs_path)})),
nd AS (SELECT doc_id,
              try_cast(regexp_extract(s.text, 'id=(-?\\d+)', 1) AS bigint) AS id,
              try_cast(regexp_extract(s.text, 'lon=(-?\\d+)', 1) AS int) AS lon,
              try_cast(regexp_extract(s.text, 'lat=(-?\\d+)', 1) AS int) AS lat,
              try_cast(regexp_extract(s.text, 'ver=(\\d+)', 1) AS int) AS version,
              try_cast(regexp_extract(s.text, 'ts=(\\d+)', 1) AS bigint) AS ts
       FROM sp WHERE s.kind = 'node'),
wr AS (SELECT doc_id,
              try_cast(regexp_extract(s.text, 'way=(-?\\d+)', 1) AS bigint) AS way,
              try_cast(regexp_extract(s.text, 'pos=(-?\\d+)', 1) AS int) AS pos,
              try_cast(regexp_extract(s.text, 'ref=(-?\\d+)', 1) AS bigint) AS ref
       FROM sp WHERE s.kind = 'way_ref'),
rm AS (SELECT doc_id,
              try_cast(regexp_extract(s.text, 'rel=(-?\\d+)', 1) AS bigint) AS rel,
              try_cast(regexp_extract(s.text, 'pos=(-?\\d+)', 1) AS int) AS pos,
              regexp_extract(s.text, 'type=(\\w+)', 1) AS mem_type,
              try_cast(regexp_extract(s.text, 'ref=(-?\\d+)', 1) AS bigint) AS ref,
              regexp_extract(s.text, 'role=(\\w*)$', 1) AS role
       FROM sp WHERE s.kind = 'rel_member'),
tg AS (SELECT doc_id,
              regexp_extract(s.text, 'elem=(\\w+)', 1) AS elem,
              try_cast(regexp_extract(s.text, ';id=(-?\\d+)', 1) AS bigint) AS id,
              regexp_extract(s.text, ';k=([^;]*)', 1) AS k,
              regexp_extract(s.text, ';v=(.*)$', 1) AS v
       FROM sp WHERE s.kind = 'tag')
"""


def feature_exists(style: GeometryStyle, elem: str, id_expr: str) -> str:
    keys = ", ".join(_lit(k) for k in style.feature_keys)
    return (f"EXISTS (SELECT 1 FROM tg WHERE tg.elem = '{elem}' "
            f"AND tg.id = {id_expr} AND tg.k IN ({keys}))")


def polygon_match(style: GeometryStyle, id_expr: str) -> str:
    clauses = []
    for k, (kind, vals) in style.polygon_tags.items():
        key = _lit(k)
        if kind == "all":
            clauses.append(f"(tg.k = {key})")
        elif kind == "include":
            lst = ", ".join(_lit(v) for v in vals)
            clauses.append(f"(tg.k = {key} AND tg.v IN ({lst}))")
        else:
            lst = ", ".join(_lit(v) for v in vals)
            clauses.append(f"(tg.k = {key} AND tg.v NOT IN ({lst}))")
    alt = " OR ".join(clauses)
    return (f"EXISTS (SELECT 1 FROM tg WHERE tg.elem = 'way' "
            f"AND tg.id = {id_expr} AND ({alt}))")


# mercator 2dp (position.rs:29-33), duckdb dialect
def merc_x(lon: str) -> str:
    return f"round({lon} * 1e-7 * {EARTH_WIDTH!r} / 180.0, 2)"


def merc_y(lat: str) -> str:
    return f"round(ln(tan(pi()/4.0 + radians({lat} * 1e-7)/2.0)) / pi() * {EARTH_WIDTH!r}, 2)"


def q_decode_nodes(docs_path: str) -> str:
    return f"""WITH {base_ctes(docs_path)},
tc AS (SELECT id, count(*) AS n FROM tg WHERE elem = 'node' GROUP BY id)
SELECT nd.id AS id, nd.lon AS lon, nd.lat AS lat,
       nd.version AS version, nd.ts AS timestamp,
       cast(coalesce(tc.n, 0) AS bigint) AS n_tags
FROM nd LEFT JOIN tc ON nd.id = tc.id"""


def q_decode_ways(docs_path: str) -> str:
    return f"""WITH {base_ctes(docs_path)}
SELECT way AS id, cast(count(*) AS bigint) AS n_refs,
       min_by(ref, pos) AS first_ref, max_by(ref, pos) AS last_ref
FROM wr GROUP BY way"""


def q_decode_relations(docs_path: str) -> str:
    return f"""WITH {base_ctes(docs_path)}
SELECT rel AS id, cast(count(*) AS bigint) AS n_members,
       cast(sum(CASE WHEN mem_type = 'way' THEN 1 ELSE 0 END) AS bigint) AS n_way_members
FROM rm GROUP BY rel"""


def q_span_roundtrip(docs_path: str) -> str:
    """Hash of the ORIGINAL span stream per doc — Spark computes the
    same hash from the re-encoded (decode->encode) stream."""
    return f"""
WITH flat AS (
  SELECT doc_id, s.kind AS kind, s.text AS text, s.media_ref AS media_ref, s.offset AS off
  FROM (SELECT doc_id, unnest(spans) AS s FROM read_parquet({_lit(docs_path)}))
)
SELECT doc_id, cast(count(*) AS bigint) AS n_spans,
       md5(string_agg(kind || '|' || text || '|' || media_ref, chr(10) ORDER BY off)) AS spans_hash
FROM flat GROUP BY doc_id"""


def q_waynode_errors(docs_path: str) -> str:
    """J1 error path: one 'missing node <ref>' per way, first missing
    ref in position order (`waywithnodes.rs:105-109`)."""
    return f"""WITH {base_ctes(docs_path)}
SELECT 'way' AS elem_type, wr.way AS elem_id,
       'missing node ' || min_by(wr.ref, wr.pos) AS message
FROM wr LEFT JOIN nd ON wr.ref = nd.id
WHERE nd.id IS NULL GROUP BY wr.way"""


def q_node_quadtree(docs_path: str, style: GeometryStyle) -> str:
    """Feature nodes with their z18 point cell + xyz — the dialect-
    neutral arithmetic encode runs verbatim in DuckDB."""
    qt = sql_point_qt("nd.lon", "nd.lat")
    return f"""WITH {base_ctes(docs_path)}
SELECT nd.id AS id, {qt} AS quadtree
FROM nd WHERE {feature_exists(style, 'node', 'nd.id')}"""


def _way_pts(style: GeometryStyle) -> str:
    """CTE fragment: ordered way points with mercator coords."""
    return f"""
wp AS (SELECT wr.way, wr.pos, wr.ref, nd.lon, nd.lat,
              {merc_x('nd.lon')} AS x, {merc_y('nd.lat')} AS y
       FROM wr JOIN nd ON wr.ref = nd.id),
wstat AS (SELECT way, count(*) AS n, min_by(ref, pos) AS f, max_by(ref, pos) AS l
          FROM wr GROUP BY way),
wok AS (SELECT wr.way FROM wr LEFT JOIN nd ON wr.ref = nd.id
        GROUP BY wr.way HAVING count(nd.id) = count(*))
"""


def q_line_length(docs_path: str, style: GeometryStyle) -> str:
    """Linestring ways (feature, not polygon) with 2dp-rounded length."""
    is_poly = polygon_match(style, "wstat.way")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
lines AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND NOT (wstat.f = wstat.l AND {is_poly})
),
seg AS (SELECT wp.way,
               sqrt(power(x - lag(x) OVER w, 2) + power(y - lag(y) OVER w, 2)) AS d
        FROM wp JOIN lines ON wp.way = lines.way
        WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos))
SELECT way AS id,
       cast(floor(coalesce(sum(d), 0.0) * 100 + 0.5) AS bigint) AS length_c
FROM seg GROUP BY way"""


def q_simple_polygon_area(docs_path: str, style: GeometryStyle) -> str:
    """Simple-polygon ways with |area| (2dp) and reversed flag.
    area = -shoelace/2 in 2dp mercator (position.rs:134-149)."""
    is_poly = polygon_match(style, "wstat.way")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
polys AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND wstat.f = wstat.l AND {is_poly}
),
cr AS (SELECT wp.way,
              (x * lead(y) OVER w - y * lead(x) OVER w) AS c
       FROM wp JOIN polys ON wp.way = polys.way
       WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos)),
ar AS (SELECT way, -0.5 * sum(c) AS signed_area FROM cr GROUP BY way)
SELECT way AS id,
       cast(floor(abs(signed_area) * 100 + 0.5) AS bigint) AS area_c,
       signed_area < 0 AS reversed
FROM ar"""


def q_lowzoom_lines(docs_path: str, style: GeometryStyle,
                    spec: MinZoomSpec, zoom: int = 8) -> str:
    """T5 lowzoom oracle: line minzoom filter + Douglas–Peucker point
    counts via a RECURSIVE CTE — each row is an interval (a, b) with
    its endpoint mercator coords; the LATERAL argmax picks the
    interior point with max perpendicular deviation (first index on
    ties, matching numpy argmax) and splits when it exceeds the z8
    pixel tolerance.  Kept points = the distinct interval endpoints.
    Closed rings simplify on their open form and re-close (+1 point),
    collapsing to 0 below 3 kept points; lines with <= 2 open points
    pass through untouched (kernels/validity.py simplify)."""
    from .kernels.mercator import EARTH_WIDTH as EW
    tol = EW * 2.0 / (2 ** zoom) / 256.0
    exact = [((k, v), z) for (k, v), z in spec.lines.items() if v != "*"]
    stars = [(k, z) for (k, v), z in spec.lines.items() if v == "*"]
    e_cases = " ".join(f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
                       for (k, v), z in exact) or "WHEN false THEN 0"
    s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}"
                       for k, z in stars) or "WHEN false THEN 0"
    mz = (f"(SELECT min(coalesce(CASE {e_cases} ELSE NULL END, "
          f"CASE {s_cases} ELSE NULL END)) FROM tg "
          f"WHERE tg.elem = 'way' AND tg.id = lines.way)")
    is_poly = polygon_match(style, "wstat.way")
    seg = "sqrt((s.bx-s.ax)*(s.bx-s.ax) + (s.by-s.ay)*(s.by-s.ay))"
    dist = (f"CASE WHEN {seg} = 0 "
            f"THEN sqrt((p.x-s.ax)*(p.x-s.ax) + (p.y-s.ay)*(p.y-s.ay)) "
            f"ELSE abs((s.bx-s.ax)*(s.ay-p.y) - (s.ax-p.x)*(s.by-s.ay)) "
            f"/ {seg} END")
    return f"""WITH RECURSIVE {base_ctes(docs_path)}, {_way_pts(style)},
lz AS (
  SELECT way, {mz} AS minzoom FROM (
    SELECT wstat.way FROM wstat
    WHERE wstat.way IN (SELECT way FROM wok)
      AND {feature_exists(style, 'way', 'wstat.way')}
      AND NOT (wstat.f = wstat.l AND {is_poly})) lines
  ) ,
lzf AS (SELECT way, minzoom FROM lz
        WHERE minzoom IS NOT NULL AND minzoom <= {zoom}),
meta AS (SELECT wp.way, count(*) AS n,
                min_by(wp.lon, wp.pos) AS flon, min_by(wp.lat, wp.pos) AS flat,
                max_by(wp.lon, wp.pos) AS llon, max_by(wp.lat, wp.pos) AS llat
         FROM wp JOIN lzf ON wp.way = lzf.way GROUP BY wp.way),
meta2 AS (SELECT way, n, (flon = llon AND flat = llat) AS closed,
                 CASE WHEN flon = llon AND flat = llat THEN n - 1 ELSE n END
                   AS m
          FROM meta),
splits(way, a, b, ax, ay, bx, by) AS (
  SELECT m2.way, 0, m2.m - 1,
         (SELECT x FROM wp WHERE wp.way = m2.way AND wp.pos = 0),
         (SELECT y FROM wp WHERE wp.way = m2.way AND wp.pos = 0),
         (SELECT x FROM wp WHERE wp.way = m2.way AND wp.pos = m2.m - 1),
         (SELECT y FROM wp WHERE wp.way = m2.way AND wp.pos = m2.m - 1)
  FROM meta2 m2 WHERE m2.m > 2
  UNION ALL
  SELECT s.way,
         CASE WHEN v.side = 0 THEN s.a ELSE mx.k END,
         CASE WHEN v.side = 0 THEN mx.k ELSE s.b END,
         CASE WHEN v.side = 0 THEN s.ax ELSE mx.px END,
         CASE WHEN v.side = 0 THEN s.ay ELSE mx.py END,
         CASE WHEN v.side = 0 THEN mx.px ELSE s.bx END,
         CASE WHEN v.side = 0 THEN mx.py ELSE s.by END
  FROM splits s
  JOIN LATERAL (
    SELECT p.pos AS k, p.x AS px, p.y AS py, {dist} AS d
    FROM wp p WHERE p.way = s.way AND p.pos > s.a AND p.pos < s.b
    ORDER BY d DESC, p.pos ASC LIMIT 1
  ) mx ON mx.d > {tol!r}
  CROSS JOIN (VALUES (0), (1)) v(side)
),
kept AS (SELECT way, count(DISTINCT u) AS kn
         FROM (SELECT way, unnest([a, b]) AS u FROM splits) GROUP BY way)
SELECT m2.way AS id, CAST(lzf.minzoom AS BIGINT) AS minzoom,
       CAST(m2.n AS INT) AS n_points_before,
       CAST(CASE WHEN m2.m <= 2 THEN m2.n
                 WHEN NOT m2.closed THEN kept.kn
                 WHEN kept.kn >= 3 THEN kept.kn + 1
                 ELSE 0 END AS INT) AS n_points_after
FROM meta2 m2
JOIN lzf ON lzf.way = m2.way
LEFT JOIN kept ON kept.way = m2.way"""


def q_make_valid_area(docs_path: str, style: GeometryStyle) -> str:
    """make_valid conservation oracle: the sum of the repaired pieces'
    ``2*signed_area`` equals the input ring's raw-coordinate shoelace
    EXACTLY (cycle decomposition partitions the cross-product terms,
    inserted crossing points are collinear) — computable in SQL as an
    exact BIGINT without re-implementing the node split.  Local-origin
    translation keeps products ~1e12 (no int64 overflow, and each
    closed cycle's shoelace is translation-invariant)."""
    is_poly = polygon_match(style, "wstat.way")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
polys AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND wstat.f = wstat.l AND {is_poly}
),
org AS (SELECT way, arg_min(lon, pos) AS ox, arg_min(lat, pos) AS oy
        FROM wp GROUP BY way),
cr AS (SELECT wp.way,
              (CAST(wp.lon - org.ox AS BIGINT) *
               lead(CAST(wp.lat - org.oy AS BIGINT)) OVER w
             - CAST(wp.lat - org.oy AS BIGINT) *
               lead(CAST(wp.lon - org.ox AS BIGINT)) OVER w) AS c
       FROM wp JOIN polys ON wp.way = polys.way
               JOIN org ON org.way = wp.way
       WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos))
SELECT way AS id, CAST(coalesce(-sum(c), 0) AS BIGINT) AS area2_raw
FROM cr GROUP BY way"""


def _sql_round_even(x: str) -> str:
    """Round-half-even (numpy/python ``round`` semantics — DuckDB's
    ``round`` is half-away-from-zero, which differs on exact .5 tile
    boundaries, e.g. tile edges at tx*87890.625)."""
    return (f"(CASE WHEN ({x}) - floor({x}) > 0.5 THEN floor({x}) + 1 "
            f"WHEN ({x}) - floor({x}) < 0.5 THEN floor({x}) "
            f"WHEN CAST(floor({x}) AS BIGINT) % 2 = 0 THEN floor({x}) "
            f"ELSE floor({x}) + 1 END)")


def _sql_tile_x(lon: str, n: int) -> str:
    x = f"(({lon}) * 1e-7 + 180.0) / 360.0"
    return (f"least(cast(floor(least(greatest({x}, 0.0), 1.0 - 1e-15) * {n}) "
            f"as bigint), {n - 1})")


def _sql_tile_y(lat: str, n: int) -> str:
    latc = f"least(greatest(({lat}) * 1e-7, -85.051128779806), 85.051128779806)"
    y = f"(1.0 - ln(tan(pi()/4.0 + radians({latc})/2.0)) / pi()) / 2.0"
    return (f"least(cast(floor(least(greatest({y}, 0.0), 1.0 - 1e-15) * {n}) "
            f"as bigint), {n - 1})")


def q_clip_lines(docs_path: str, style: GeometryStyle,
                 tile_depth: int = 12) -> str:
    """Full SQL mirror of ``spatial.joins.clip_lines_to_tiles``:
    cover cells from the line bbox (slippy tile ranges of the two
    corners at ``tile_depth``), per-cell Liang–Barsky parametric clip
    of every segment (order-independent closed form — failure iff
    final t0 > t1 plus the zero-delta slab test), run-length part
    splitting (a part breaks when the previous segment was dropped,
    exited early (t1 < 1), or its rounded exit point differs from this
    segment's rounded entry), and per-part point counts (1 + segments
    whose rounded exit differs from their rounded entry; parts with a
    single point drop, survivors renumber by first segment).  Crossing
    coordinates and tile bounds use round-half-even to match
    numpy/python rounding."""
    n = 1 << tile_depth
    is_poly = polygon_match(style, "wstat.way")
    blon = f"((tx_ / {n}.0) * 360.0 - 180.0) * 1e7"
    blon1 = f"(((tx_ + 1) / {n}.0) * 360.0 - 180.0) * 1e7"

    # DuckDB has no sinh; (exp(t)-exp(-t))/2 can differ from libm sinh
    # in the last ulp, which only matters if a tile edge lands within
    # ~1e-7 fixed-point units of a .5 rounding boundary (none do at
    # depth <= 14 — checked over all 2^14 ty values)
    def _sinh(t: str) -> str:
        return f"((exp({t}) - exp(-({t}))) / 2.0)"

    blat = (f"degrees(atan({_sinh(f'pi() * (1.0 - 2.0 * (ty_ / {n}.0))')}))"
            " * 1e7")
    blat1 = (f"degrees(atan({_sinh(f'pi() * (1.0 - 2.0 * ((ty_ + 1) / {n}.0))')}))"
             " * 1e7")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
lines AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND NOT (wstat.f = wstat.l AND {is_poly})
),
bb AS (SELECT wp.way, min(lon) AS mnx, min(lat) AS mny,
              max(lon) AS mxx, max(lat) AS mxy
       FROM wp JOIN lines ON wp.way = lines.way GROUP BY wp.way),
crn AS (SELECT way,
               {_sql_tile_x('mnx', n)} AS txa, {_sql_tile_y('mny', n)} AS tya,
               {_sql_tile_x('mxx', n)} AS txb, {_sql_tile_y('mxy', n)} AS tyb
        FROM bb),
gx AS (SELECT way, unnest(range(least(txa, txb), greatest(txa, txb) + 1)) AS tx_,
              least(tya, tyb) AS ty0, greatest(tya, tyb) AS ty1
       FROM crn),
cells AS (SELECT way, tx_, unnest(range(ty0, ty1 + 1)) AS ty_ FROM gx),
cb AS (SELECT way, {sql_tile_qt('tx_', 'ty_', tile_depth)} AS cell,
              CAST({_sql_round_even(blon)} AS DOUBLE) AS bminx,
              CAST({_sql_round_even(blon1)} AS DOUBLE) AS bmaxx,
              CAST({_sql_round_even(blat1)} AS DOUBLE) AS bminy,
              CAST({_sql_round_even(blat)} AS DOUBLE) AS bmaxy
       FROM cells),
seg AS (SELECT cb.way, cb.cell, bminx, bmaxx, bminy, bmaxy, wp.pos,
               CAST(wp.lon AS DOUBLE) AS px, CAST(wp.lat AS DOUBLE) AS py,
               lead(CAST(wp.lon AS DOUBLE)) OVER w AS qx,
               lead(CAST(wp.lat AS DOUBLE)) OVER w AS qy
        FROM cb JOIN wp ON wp.way = cb.way
        WINDOW w AS (PARTITION BY cb.way, cb.cell ORDER BY wp.pos)),
lb AS (SELECT *, qx - px AS dx, qy - py AS dy FROM seg WHERE qx IS NOT NULL),
tt AS (SELECT *,
  greatest(0.0,
    CASE WHEN dx = 0 THEN 0.0 WHEN dx > 0 THEN (bminx - px) / dx
         ELSE (bmaxx - px) / dx END,
    CASE WHEN dy = 0 THEN 0.0 WHEN dy > 0 THEN (bminy - py) / dy
         ELSE (bmaxy - py) / dy END) AS t0,
  least(1.0,
    CASE WHEN dx = 0 THEN 1.0 WHEN dx > 0 THEN (bmaxx - px) / dx
         ELSE (bminx - px) / dx END,
    CASE WHEN dy = 0 THEN 1.0 WHEN dy > 0 THEN (bmaxy - py) / dy
         ELSE (bminy - py) / dy END) AS t1
  FROM lb),
pts AS (SELECT *,
  (t0 <= t1 AND (dx != 0 OR (px >= bminx AND px <= bmaxx))
           AND (dy != 0 OR (py >= bminy AND py <= bmaxy))) AS kept,
  CAST({_sql_round_even('px + t0 * dx')} AS BIGINT) AS axr,
  CAST({_sql_round_even('py + t0 * dy')} AS BIGINT) AS ayr,
  CAST({_sql_round_even('px + t1 * dx')} AS BIGINT) AS bxr,
  CAST({_sql_round_even('py + t1 * dy')} AS BIGINT) AS byr,
  (t1 < 1.0) AS ex
  FROM tt),
lg AS (SELECT *, lag(kept) OVER w AS lk, lag(ex) OVER w AS lex,
              lag(bxr) OVER w AS lbx, lag(byr) OVER w AS lby
       FROM pts WINDOW w AS (PARTITION BY way, cell ORDER BY pos)),
run0 AS (SELECT *, CASE WHEN lk AND NOT lex AND lbx = axr AND lby = ayr
                        THEN 0 ELSE 1 END AS brk
         FROM lg WHERE kept),
run1 AS (SELECT *, sum(brk) OVER (PARTITION BY way, cell ORDER BY pos) AS rid
         FROM run0),
agg AS (SELECT way, cell, rid, min(pos) AS p0,
               1 + sum(CASE WHEN bxr != axr OR byr != ayr THEN 1 ELSE 0 END)
                 AS np
        FROM run1 GROUP BY way, cell, rid)
SELECT way AS id, cell,
       CAST(row_number() OVER (PARTITION BY way, cell ORDER BY p0) - 1
            AS INT) AS part,
       CAST(np AS BIGINT) AS n_points
FROM agg WHERE np >= 2"""


def _relation_tag_union(style: GeometryStyle) -> str:
    """UNION ALL producing (way_id, target_key, out_val) J4 rows
    (shared by q_relation_tags and the way-level geojson oracles)."""
    parts = []
    for i, spec in enumerate(style.relation_tag_spec):
        conds = " AND ".join(
            f"EXISTS (SELECT 1 FROM tg WHERE tg.elem='rel' AND tg.id=r.rel "
            f"AND tg.k={_lit(k)} AND tg.v={_lit(v)})"
            for k, v in spec.source_filter.items())
        val = (f"(SELECT tg.v FROM tg WHERE tg.elem='rel' AND tg.id=r.rel "
               f"AND tg.k={_lit(spec.source_key)} LIMIT 1)")
        if spec.op_type == "min":
            agg = "cast(min(try_cast(val AS bigint)) AS varchar)"
        elif spec.op_type == "max":
            agg = "cast(max(try_cast(val AS bigint)) AS varchar)"
        else:
            agg = "string_agg(DISTINCT val, '; ' ORDER BY val)"
        parts.append(f"""
SELECT way_id, {_lit(spec.target_key)} AS target_key, {agg} AS out_val
FROM (SELECT r.ref AS way_id, {val} AS val
      FROM rm r WHERE r.mem_type = 'way' AND {conds}
        AND {val} IS NOT NULL) t
GROUP BY way_id HAVING {agg} IS NOT NULL""")
    return " UNION ALL ".join(f"({p})" for p in parts)


def q_relation_tags(docs_path: str, style: GeometryStyle) -> str:
    """Way-level aggregated relation tags (J4) — one row per
    (way, target_key)."""
    return f"""WITH {base_ctes(docs_path)}
SELECT * FROM ({_relation_tag_union(style)}) ORDER BY way_id, target_key"""


def _parent_tag_union(style: GeometryStyle) -> str:
    """UNION ALL producing (node_id, spec_key, val) parent-tag rows
    (shared by q_parent_tags and the geojson oracles, whose props
    include the J3-merged tags)."""
    parts = []
    for spec_key, sp in style.parent_tags.items():
        nkeys = ", ".join(_lit(k) for k in sp.node_keys)
        if sp.way_priority:
            cases = " ".join(f"WHEN {_lit(v)} THEN {p}"
                             for v, p in sp.way_priority.items())
            prio = f"(CASE wt.v {cases} ELSE NULL END)"
        else:
            prio = "0"
        # tie-break (priority DESC, way_id ASC) == reference's
        # first-way-in-stream pick; a composite ORDER BY (window
        # row_number) instead of the old scalar prio*1e13-way_id key,
        # which silently corrupted ordering for negative or >=1e13
        # ids (round-2 ADVICE)
        parts.append(f"""
SELECT node_id, {_lit(spec_key)} AS spec_key, val
FROM (
  SELECT node_id, val, row_number() OVER (
           PARTITION BY node_id ORDER BY prio DESC, way_id ASC) AS rn
  FROM (
    SELECT wr.ref AS node_id, wr.way AS way_id, wt.v AS val, {prio} AS prio
    FROM wr
    JOIN tg wt ON wt.elem = 'way' AND wt.id = wr.way AND wt.k = {_lit(sp.way_key)}
    WHERE EXISTS (SELECT 1 FROM tg nt WHERE nt.elem = 'node'
                  AND nt.id = wr.ref AND nt.k IN ({nkeys}))
  ) t WHERE prio IS NOT NULL
) r WHERE rn = 1""")
    return " UNION ALL ".join(f"({p})" for p in parts)


def q_parent_tags(docs_path: str, style: GeometryStyle) -> str:
    """Node-level parent tags (J3) — one row per (node, spec_key);
    tie-break (priority DESC, way_id ASC), the reference's
    first-way-in-stream pick (`addparenttag.rs:108-112`)."""
    return f"""WITH {base_ctes(docs_path)}
SELECT * FROM ({_parent_tag_union(style)}) ORDER BY node_id, spec_key"""


def q_minzoom_points(docs_path: str, style: GeometryStyle,
                     spec: MinZoomSpec) -> str:
    """Feature-node minzoom + rounded quadtree (G14)."""
    exact = [((k, v), z) for (k, v), z in spec.points.items() if v != "*"]
    stars = [(k, z) for (k, v), z in spec.points.items() if v == "*"]
    e_cases = " ".join(f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
                       for (k, v), z in exact)
    s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}" for k, z in stars)
    zoom = (f"(SELECT min(coalesce(CASE {e_cases} ELSE NULL END, "
            f"CASE {s_cases} ELSE NULL END)) FROM tg "
            f"WHERE tg.elem = 'node' AND tg.id = nd.id)")
    qt = sql_point_qt("nd.lon", "nd.lat")
    rqt = sql_round_qt("q0", "mz")
    return f"""WITH {base_ctes(docs_path)},
fz AS (SELECT nd.id AS id, {zoom} AS mz, {qt} AS q0
       FROM nd WHERE {feature_exists(style, 'node', 'nd.id')})
SELECT id, mz AS minzoom,
       CASE WHEN mz IS NULL THEN q0 ELSE {rqt} END AS quadtree
FROM fz"""


def _fz_cte(style: GeometryStyle, spec: MinZoomSpec) -> str:
    """CTE fragment ``fz``: feature nodes with (id, lon, lat, minzoom,
    final quadtree) — the node-side output of G10+G14 (shared by the
    minzoom / tile / raster-vector / knn oracles)."""
    exact = [((k, v), z) for (k, v), z in spec.points.items() if v != "*"]
    stars = [(k, z) for (k, v), z in spec.points.items() if v == "*"]
    e_cases = " ".join(f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
                       for (k, v), z in exact)
    s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}" for k, z in stars)
    zoom = (f"(SELECT min(coalesce(CASE {e_cases} ELSE NULL END, "
            f"CASE {s_cases} ELSE NULL END)) FROM tg "
            f"WHERE tg.elem = 'node' AND tg.id = nd.id)")
    qt = sql_point_qt("nd.lon", "nd.lat")
    rqt = sql_round_qt("q0", "mz")
    return f"""
fz0 AS (SELECT nd.id AS id, nd.lon AS lon, nd.lat AS lat,
               {zoom} AS mz, {qt} AS q0
        FROM nd WHERE {feature_exists(style, 'node', 'nd.id')}),
fz AS (SELECT id, lon, lat, mz,
              CASE WHEN mz IS NULL THEN q0 ELSE {rqt} END AS quadtree
       FROM fz0)
"""


def q_tile_assignment(docs_path: str, style: GeometryStyle,
                      spec: MinZoomSpec, group_depth: int = 8) -> str:
    """Per-tile point counts (S5/J6): the tile dictionary is the
    distinct depth-``group_depth`` round of ALL node z18 cells; each
    feature point gets its deepest registered ancestor, else -1."""
    qt = sql_point_qt("nd.lon", "nd.lat")
    d = str(group_depth)
    r8 = sql_round_qt("quadtree", d)
    return f"""WITH {base_ctes(docs_path)}, {_fz_cte(style, spec)},
dict AS (SELECT DISTINCT {sql_round_qt('q0', d)} AS tile
         FROM (SELECT {qt} AS q0 FROM nd)),
alloc AS (SELECT CASE WHEN {sql_qt_depth('quadtree')} >= {group_depth}
                       AND {r8} IN (SELECT tile FROM dict)
                      THEN {r8} ELSE -1 END AS tile
          FROM fz)
SELECT tile, count(*) AS n_points FROM alloc GROUP BY tile"""


def q_pip_join(docs_path: str, style: GeometryStyle) -> str:
    """Brute-force point-in-polygon oracle: every (feature node,
    simple-polygon way) pair with the pnpoly crossing test in float
    degrees — IDENTICAL arithmetic to kernels.geomcalc.points_in_ring
    (edges (i-1, i), xcross = (xj-xi)(ty-yi)/(yj-yi)+xi, strict <).
    A cheap bbox pre-filter (lossless: inside => within bbox) keeps
    the cross product small."""
    is_poly = polygon_match(style, "wstat.way")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
polys AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND wstat.f = wstat.l AND {is_poly}
),
rings AS (SELECT wp.way,
                 list(struct_pack(lon := wp.lon, lat := wp.lat) ORDER BY wp.pos) AS ll,
                 min(wp.lon) AS minlon, min(wp.lat) AS minlat,
                 max(wp.lon) AS maxlon, max(wp.lat) AS maxlat
          FROM wp JOIN polys ON wp.way = polys.way GROUP BY wp.way),
fpts AS (SELECT nd.id, nd.lon, nd.lat FROM nd
         WHERE {feature_exists(style, 'node', 'nd.id')})
SELECT f.id AS point_id, r.way AS polygon_id
FROM fpts f JOIN rings r
  ON f.lon BETWEEN r.minlon AND r.maxlon
 AND f.lat BETWEEN r.minlat AND r.maxlat
WHERE (len(list_filter(generate_series(2, len(r.ll)), i ->
        ((r.ll[i].lat * 1e-7 > f.lat * 1e-7) != (r.ll[i-1].lat * 1e-7 > f.lat * 1e-7))
        AND f.lon * 1e-7 < (r.ll[i-1].lon * 1e-7 - r.ll[i].lon * 1e-7)
            * (f.lat * 1e-7 - r.ll[i].lat * 1e-7)
            / (r.ll[i-1].lat * 1e-7 - r.ll[i].lat * 1e-7)
            + r.ll[i].lon * 1e-7)) % 2) = 1"""


def q_knn_join(docs_path: str, style: GeometryStyle, k: int = 3) -> str:
    """Brute-force exact kNN oracle over feature nodes (2dp mercator,
    row_number tie-break on target id) — valid because knn_join is
    exact (phase-2 brute-force fallback for unsettled queries)."""
    return f"""WITH {base_ctes(docs_path)},
fpts AS (SELECT nd.id, {merc_x('nd.lon')} AS x, {merc_y('nd.lat')} AS y
         FROM nd WHERE {feature_exists(style, 'node', 'nd.id')}),
pairs AS (SELECT q.id AS query_id, t.id AS target_id,
                 sqrt(power(q.x - t.x, 2) + power(q.y - t.y, 2)) AS dist
          FROM fpts q JOIN fpts t ON q.id <> t.id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY dist, target_id) AS rn FROM pairs)
SELECT query_id, target_id,
       cast(floor(dist * 100 + 0.5) AS bigint) AS dist_c
FROM ranked WHERE rn <= {k}"""


def q_raster_vector(docs_path: str, style: GeometryStyle,
                    spec: MinZoomSpec) -> str:
    """media raster tiles ⋈ feature points where one quadtree cell is
    an ancestor-or-self of the other (mirrors
    spatial.joins.raster_vector_join's two equi-join directions as a
    single symmetric predicate)."""
    dm = sql_qt_depth("m.tile_cell")
    df = sql_qt_depth("f.quadtree")
    r_f_at_m = sql_round_qt("f.quadtree", dm)
    r_m_at_f = sql_round_qt("m.tile_cell", df)
    return f"""WITH {base_ctes(docs_path)}, {_fz_cte(style, spec)},
md AS (SELECT doc_id, s.media_ref AS tile,
              cast(string_split(s.media_ref, '/')[1] AS bigint) AS z,
              cast(string_split(s.media_ref, '/')[2] AS bigint) AS x,
              cast(string_split(s.media_ref, '/')[3] AS bigint) AS y
       FROM sp WHERE s.kind = 'media'),
mc AS (SELECT doc_id, tile,
              (coalesce(list_sum(list_transform(generate_series(0, z - 1), s ->
                 (((x // power(2, s)::bigint) % 2) * 2 +
                  ((y // power(2, s)::bigint) % 2)) * power(4, s)::bigint)), 0)
               * power(4, 18 - z)::bigint) * 32 + z AS tile_cell
       FROM md)
SELECT DISTINCT m.doc_id AS doc_id, m.tile AS tile,
       f.id AS feature_id, f.quadtree AS quadtree
FROM mc m JOIN fz f
  ON (({dm}) <= ({df}) AND {r_f_at_m} = m.tile_cell)
  OR (({df}) <= ({dm}) AND {r_m_at_f} = f.quadtree)"""


def _tag_keep_cond(style: GeometryStyle, t: str = "tg") -> str:
    """DuckDB mirror of style.sql_filter_tags' keep-set."""
    conds = []
    if style.other_keys is not None:
        keep = sorted(set(style.feature_keys) | set(style.other_keys))
        conds.append(f"{t}.k IN ({', '.join(_lit(k) for k in keep)})")
    drops = [d for d in style.drop_keys if not d.endswith(":")]
    if drops:
        conds.append(f"NOT {t}.k IN ({', '.join(_lit(d) for d in drops)})")
    for p in (d for d in style.drop_keys if d.endswith(":")):
        conds.append(f"NOT starts_with({t}.k, {_lit(p)})")
    return " AND ".join(conds) if conds else "true"


def _dd_deg(col: str) -> str:
    """Fixed 7-decimal degree string (mirror of sinks._deg_str)."""
    return (f"concat(CASE WHEN ({col}) < 0 THEN '-' ELSE '' END, "
            f"cast(abs({col}) // 10000000 AS varchar), '.', "
            f"lpad(cast(abs({col}) % 10000000 AS varchar), 7, '0'))")


def _geojson_point_feature(style: GeometryStyle) -> str:
    """Feature-JSON string for one node row ``nd`` (filtered own tags
    merged with J3 parent tags from the ``ptag`` CTE, sorted keys, 7dp
    point coords) — byte-identical to
    sinks.geojson_feature_expr('point') over the pipeline's points."""
    own = (f"SELECT tg.k AS k, tg.v AS v FROM tg "
           f"WHERE tg.elem = 'node' AND tg.id = nd.id")
    if style.parent_tags:
        own += (" UNION ALL SELECT pt.spec_key AS k, pt.val AS v "
                "FROM ptag pt WHERE pt.node_id = nd.id")
    props = (f"coalesce('{{' || (SELECT string_agg("
             f"'\"' || u.k || '\":\"' || u.v || '\"', ',' ORDER BY u.k) "
             f"FROM ({own}) u WHERE {_tag_keep_cond(style, 'u')}) "
             f"|| '}}', '{{}}')")
    return (f"'{{\"type\":\"Feature\",\"id\":' || nd.id || "
            f"',\"quadtree\":' || {_qt_xyz_dd('fz.quadtree')} || "
            f"',\"properties\":' || {props} || "
            f"',\"geometry\":{{\"type\":\"Point\",\"coordinates\":[' || "
            f"{_dd_deg('nd.lon')} || ',' || {_dd_deg('nd.lat')} || ']}}' || "
            f"{_opt_dd('layer', _layer_dd('node', 'nd.id'))} || "
            f"{_opt_dd('minzoom', 'fz.mz')} || "
            f"',\"bbox\":' || "
            f"{_bbox_dd('nd.lon', 'nd.lat', 'nd.lon', 'nd.lat')} || '}}'")


def _ptag_cte(style: GeometryStyle) -> str:
    if not style.parent_tags:
        return "ptag AS (SELECT NULL AS node_id, NULL AS spec_key, NULL AS val WHERE false)"
    return f"ptag AS ({_parent_tag_union(style)})"


def q_geojson_points(docs_path: str, style: GeometryStyle,
                     spec: MinZoomSpec) -> str:
    return f"""WITH {base_ctes(docs_path)}, {_ptag_cte(style)},
{_fz_cte(style, spec)}
SELECT nd.id AS id, {_geojson_point_feature(style)} AS feature
FROM fz JOIN nd ON nd.id = fz.id"""


def q_geojson_tiles(docs_path: str, style: GeometryStyle,
                    spec: MinZoomSpec, group_depth: int = 8) -> str:
    """Per-tile FeatureCollection blocks over the allocated feature
    points (S6 per-tile writer, `process_geometry.rs:343-388`)."""
    qt = sql_point_qt("nd.lon", "nd.lat")
    d = str(group_depth)
    r8 = sql_round_qt("fz.quadtree", d)
    return f"""WITH {base_ctes(docs_path)}, {_ptag_cte(style)}, {_fz_cte(style, spec)},
dict AS (SELECT DISTINCT {sql_round_qt('q0', d)} AS tile
         FROM (SELECT {qt} AS q0 FROM nd)),
pf AS (SELECT CASE WHEN {sql_qt_depth('fz.quadtree')} >= {group_depth}
                    AND {r8} IN (SELECT tile FROM dict)
                   THEN {r8} ELSE -1 END AS tile,
              nd.id AS id, {_geojson_point_feature(style)} AS feature
       FROM fz JOIN nd ON nd.id = fz.id)
SELECT tile, count(*) AS n_features,
       '{{"type":"FeatureCollection","features":[' ||
       string_agg(feature, ',' ORDER BY id) || ']}}' AS collection
FROM pf GROUP BY tile"""


def _deg_dd(col: str) -> str:
    """Fixed 7-decimal degree string from 1e-7 fixed-point — same
    integer string math as sinks._deg_str, so JSON matches byte-for-
    byte (float formatting never enters)."""
    return (f"concat(CASE WHEN ({col}) < 0 THEN '-' ELSE '' END, "
            f"CAST(abs({col}) // 10000000 AS VARCHAR), '.', "
            f"lpad(CAST(abs({col}) % 10000000 AS VARCHAR), 7, '0'))")


def _num1_dd(col: str) -> str:
    """1dp number string (mirror of sinks._num1_str)."""
    v10 = f"CAST(floor(({col}) * 10.0 + 0.5) AS BIGINT)"
    return (f"(CAST(({v10}) // 10 AS VARCHAR) || '.' || "
            f"CAST(({v10}) % 10 AS VARCHAR))")


def _opt_dd(name: str, expr: str) -> str:
    """Optional numeric JSON member (mirror of sinks._opt_field)."""
    return (f"(CASE WHEN ({expr}) IS NULL THEN '' "
            f"ELSE ',\"{name}\":' || CAST({expr} AS VARCHAR) END)")


def _qt_xyz_dd(qt_expr: str) -> str:
    """'[x,y,z]' string for a quadtree cell (kernels.sql_qt_xyz is
    dialect-neutral)."""
    from .kernels.quadtree import sql_qt_xyz
    tx, ty, d = sql_qt_xyz(qt_expr)
    return (f"('[' || CAST({tx} AS VARCHAR) || ',' || "
            f"CAST({ty} AS VARCHAR) || ',' || CAST({d} AS VARCHAR) || ']')")


def _bbox_dd(a: str, b: str, c: str, d: str) -> str:
    """'[minlon,minlat,maxlon,maxlat]' at fixed 7dp."""
    return (f"('[' || {_deg_dd(a)} || ',' || {_deg_dd(b)} || ',' || "
            f"{_deg_dd(c)} || ',' || {_deg_dd(d)} || ']')")


def _layer_dd(elem: str, id_expr: str) -> str:
    """style.sql_layer mirror: int-parsed 'layer' tag, NULL otherwise.

    Aggregated (max) like the sibling _zorder_dd/_mz_lookup_sql
    helpers — a duplicated (elem, id, 'layer') row in the non-distinct
    tg CTE must not raise DuckDB's multi-row scalar-subquery error
    (round-3 ADVICE)."""
    return (f"(SELECT max(try_cast(tg.v AS BIGINT)) FROM tg "
            f"WHERE tg.elem = '{elem}' AND tg.id = {id_expr} "
            f"AND tg.k = 'layer')")


def _zorder_dd(style: GeometryStyle, id_expr: str) -> str:
    """style.sql_z_order mirror: max over tags of (exact-pair z,
    else star-key z)."""
    pairs, stars = [], {}
    for k, vals in style.z_order_spec.items():
        for v, z in vals.items():
            if v == "*":
                stars[k] = z
            else:
                pairs.append(((k, v), z))
    e_cases = " ".join(f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
                       for (k, v), z in pairs) or "WHEN false THEN 0"
    s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}"
                       for k, z in stars.items()) or "WHEN false THEN 0"
    return (f"(SELECT max(coalesce(CASE {e_cases} ELSE NULL END, "
            f"CASE {s_cases} ELSE NULL END)) FROM tg "
            f"WHERE tg.elem = 'way' AND tg.id = {id_expr})")


def _bbox_qt_dd(bl: str, bb: str, br: str, bt: str) -> str:
    """calculate_bbox mirror: corner cells at depth 18 rounded to the
    deepest depth where both corners share a tile (the
    with_bbox_quadtree recalc)."""
    cd = (f"list_max(list_filter(generate_series(0, 18), dd -> "
          f"floor({_sql_tile_x(bl, 1 << 18)} / power(2, 18 - dd)) "
          f"= floor({_sql_tile_x(br, 1 << 18)} / power(2, 18 - dd)) "
          f"AND floor({_sql_tile_y(bb, 1 << 18)} / power(2, 18 - dd)) "
          f"= floor({_sql_tile_y(bt, 1 << 18)} / power(2, 18 - dd))))")
    return sql_round_qt(sql_point_qt(bl, bb), cd)


def q_geojson_polygons(docs_path: str, style: GeometryStyle,
                       spec: MinZoomSpec) -> str:
    """Simple-polygon GeoJSON features (S6): way props = way tags +
    J4 relation-tag merges (sorted keys), ring coordinates at fixed
    7dp, REVERSED polygons emit their coordinate list reversed
    (simplepolygongeometry.rs:12-27; reversed = mercator shoelace
    sign, same derivation as simple_polygon_area).  Round-3 parity
    members: quadtree [x,y,z] (bbox recalc + minzoom rounding),
    way_area 1dp, optional layer/minzoom, trailing bbox
    (z_order is always NULL for polygons -> omitted, matching the
    engine's make_ways)."""
    is_poly = polygon_match(style, "wstat.way")
    pt = f"concat('[', {_deg_dd('wp.lon')}, ',', {_deg_dd('wp.lat')}, ']')"
    mz = _poly_mz_sql(spec, _mz_lookup_sql(spec.polygons, "way", "g.way"),
                      "g.area")
    rqt = sql_round_qt("g.q0", "g.mz")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
polys AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND wstat.f = wstat.l AND {is_poly}
),
cr AS (SELECT wp.way,
              (x * lead(y) OVER w - y * lead(x) OVER w) AS c
       FROM wp JOIN polys ON wp.way = polys.way
       WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos)),
ar AS (SELECT way, (-0.5 * sum(c)) < 0 AS rev,
              abs(-0.5 * sum(c)) AS area
       FROM cr GROUP BY way),
geo AS MATERIALIZED (
  SELECT wp.way, min(wp.lon) AS bl, min(wp.lat) AS bb,
         max(wp.lon) AS br, max(wp.lat) AS bt
  FROM wp JOIN polys ON wp.way = polys.way GROUP BY wp.way),
gq AS MATERIALIZED (
  SELECT g.way, g.mz,
         CASE WHEN g.mz IS NULL THEN g.q0 ELSE {rqt} END AS quadtree,
         g.bl, g.bb, g.br, g.bt
  FROM (SELECT g.way, {mz} AS mz,
               {_bbox_qt_dd('g.bl', 'g.bb', 'g.br', 'g.bt')} AS q0,
               g.bl, g.bb, g.br, g.bt
        FROM (SELECT geo.*, ar.area FROM geo
              JOIN ar ON ar.way = geo.way) g) g),
pj AS (SELECT wp.way, list({pt} ORDER BY wp.pos) AS pts
       FROM wp JOIN polys ON wp.way = polys.way GROUP BY wp.way),
alltags AS (
  SELECT tg.id AS way, tg.k AS k, tg.v AS v FROM tg WHERE tg.elem = 'way'
  UNION ALL
  SELECT way_id, target_key, out_val FROM ({_relation_tag_union(style)})),
props AS (SELECT way,
                 '{{' || string_agg('"' || k || '":"' || v || '"',
                                    ',' ORDER BY k) || '}}' AS pjson
          FROM alltags GROUP BY way)
SELECT p.way AS id,
       '{{"type":"Feature","id":' || CAST(p.way AS VARCHAR) ||
       ',"quadtree":' || {_qt_xyz_dd('gq.quadtree')} ||
       ',"properties":' || props.pjson ||
       ',"geometry":{{"type":"Polygon","coordinates":[[' ||
       array_to_string(CASE WHEN ar.rev THEN list_reverse(p.pts)
                            ELSE p.pts END, ',') ||
       ']]}}' ||
       ',"way_area":' || {_num1_dd('ar.area')} ||
       {_opt_dd('layer', _layer_dd('way', 'p.way'))} ||
       {_opt_dd('minzoom', 'gq.mz')} ||
       ',"bbox":' || {_bbox_dd('gq.bl', 'gq.bb', 'gq.br', 'gq.bt')} ||
       '}}' AS feature
FROM pj p JOIN ar ON ar.way = p.way JOIN props ON props.way = p.way
JOIN gq ON gq.way = p.way"""


def q_geojson_lines(docs_path: str, style: GeometryStyle,
                    spec: MinZoomSpec) -> str:
    """Linestring GeoJSON features (S6): same byte-exact recipe as
    q_geojson_polygons over the non-polygon feature ways.  Round-3
    parity members: quadtree [x,y,z], way_length 1dp, optional
    layer/z_order/minzoom, trailing bbox."""
    is_poly = polygon_match(style, "wstat.way")
    pt = f"concat('[', {_deg_dd('wp.lon')}, ',', {_deg_dd('wp.lat')}, ']')"
    mz = _mz_lookup_sql(spec.lines, "way", "g.way")
    rqt = sql_round_qt("g.q0", "g.mz")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
lines AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND NOT (wstat.f = wstat.l AND {is_poly})
),
seg AS (SELECT wp.way,
               sqrt(power(x - lag(x) OVER w, 2) + power(y - lag(y) OVER w, 2)) AS d
        FROM wp JOIN lines ON wp.way = lines.way
        WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos)),
ln AS (SELECT way, coalesce(sum(d), 0.0) AS length FROM seg GROUP BY way),
geo AS MATERIALIZED (
  SELECT wp.way, min(wp.lon) AS bl, min(wp.lat) AS bb,
         max(wp.lon) AS br, max(wp.lat) AS bt
  FROM wp JOIN lines ON wp.way = lines.way GROUP BY wp.way),
gq AS MATERIALIZED (
  SELECT g.way, g.mz,
         CASE WHEN g.mz IS NULL THEN g.q0 ELSE {rqt} END AS quadtree,
         g.bl, g.bb, g.br, g.bt
  FROM (SELECT g.way, {mz} AS mz,
               {_bbox_qt_dd('g.bl', 'g.bb', 'g.br', 'g.bt')} AS q0,
               g.bl, g.bb, g.br, g.bt
        FROM geo g) g),
pj AS (SELECT wp.way, list({pt} ORDER BY wp.pos) AS pts
       FROM wp JOIN lines ON wp.way = lines.way GROUP BY wp.way),
alltags AS (
  SELECT tg.id AS way, tg.k AS k, tg.v AS v FROM tg WHERE tg.elem = 'way'
  UNION ALL
  SELECT way_id, target_key, out_val FROM ({_relation_tag_union(style)})),
props AS (SELECT way,
                 '{{' || string_agg('"' || k || '":"' || v || '"',
                                    ',' ORDER BY k) || '}}' AS pjson
          FROM alltags GROUP BY way)
SELECT p.way AS id,
       '{{"type":"Feature","id":' || CAST(p.way AS VARCHAR) ||
       ',"quadtree":' || {_qt_xyz_dd('gq.quadtree')} ||
       ',"properties":' || props.pjson ||
       ',"geometry":{{"type":"LineString","coordinates":[' ||
       array_to_string(p.pts, ',') || ']}}' ||
       ',"way_length":' || {_num1_dd('ln.length')} ||
       {_opt_dd('layer', _layer_dd('way', 'p.way'))} ||
       {_opt_dd('z_order', _zorder_dd(style, 'p.way'))} ||
       {_opt_dd('minzoom', 'gq.mz')} ||
       ',"bbox":' || {_bbox_dd('gq.bl', 'gq.bb', 'gq.br', 'gq.bt')} ||
       '}}' AS feature
FROM pj p JOIN props ON props.way = p.way
JOIN ln ON ln.way = p.way JOIN gq ON gq.way = p.way"""


def q_multipolygons_closed_rings(docs_path: str,
                                 style: GeometryStyle) -> str:
    """Independent re-derivation of multipolygon assembly for the
    SQL-tractable subclass: relations whose members are all resolvable
    CLOSED ways (each way IS one ring — no part merging).  Pins the
    assembly arithmetic (J2/G7-G9): 2dp-mercator ring areas,
    winding-normalized area sum (Σ|outer| − Σ|assigned inner|), and
    the reference's containment rule (outer bbox ⊇ inner bbox AND
    pnpoly(inner first point, outer ring), `rings.py _add_ring` /
    `multipolygons.rs`); orphan inners are dropped like the
    reference's rem list.  Assumes no outer-in-outer nesting within a
    relation (true of the fixture scenes; nested outers would need the
    iterative parts fold)."""
    mp_types = (["multipolygon", "boundary"] if style.boundary_relations
                else ["multipolygon"])
    types = ", ".join(_lit(t) for t in mp_types)
    mx = merc_x("wp.lon")
    my = merc_y("wp.lat")
    # pnpoly: inner ring first point vs outer ring (float degrees,
    # identical arithmetic to kernels.geomcalc.points_in_ring)
    pnp = ("(len(list_filter(generate_series(2, len(ro.ll)), i -> "
           "((ro.ll[i].lat * 1e-7 > ri.ll[1].lat * 1e-7) != "
           " (ro.ll[i-1].lat * 1e-7 > ri.ll[1].lat * 1e-7)) "
           "AND ri.ll[1].lon * 1e-7 < "
           "(ro.ll[i-1].lon * 1e-7 - ro.ll[i].lon * 1e-7) * "
           "(ri.ll[1].lat * 1e-7 - ro.ll[i].lat * 1e-7) / "
           "(ro.ll[i-1].lat * 1e-7 - ro.ll[i].lat * 1e-7) + "
           "ro.ll[i].lon * 1e-7)) % 2) = 1")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
closedw AS (SELECT wstat.way FROM wstat
            WHERE wstat.way IN (SELECT way FROM wok) AND wstat.f = wstat.l),
relgood AS (
  SELECT rm.rel FROM rm GROUP BY rm.rel
  HAVING count(*) = sum(CASE WHEN mem_type = 'way' THEN 1 ELSE 0 END)
     AND sum(CASE WHEN role != 'inner' THEN 1 ELSE 0 END) >= 1
     AND sum(CASE WHEN mem_type = 'way'
              AND ref IN (SELECT way FROM closedw) THEN 1 ELSE 0 END) = count(*)),
relok AS (
  SELECT rel FROM relgood
  WHERE EXISTS (SELECT 1 FROM tg WHERE tg.elem = 'rel' AND tg.id = rel
                AND tg.k = 'type' AND tg.v IN ({types}))
    AND {feature_exists(style, 'rel', 'rel')}),
rstat AS (
  SELECT way, ll,
         -0.5 * list_sum(list_transform(generate_series(1, len(ll) - 1),
             i -> ll[i].x * ll[i+1].y - ll[i].y * ll[i+1].x)) AS sarea,
         list_min(list_transform(ll, p -> p.lon)) AS minlon,
         list_min(list_transform(ll, p -> p.lat)) AS minlat,
         list_max(list_transform(ll, p -> p.lon)) AS maxlon,
         list_max(list_transform(ll, p -> p.lat)) AS maxlat
  FROM (SELECT wp.way,
               list(struct_pack(lon := wp.lon, lat := wp.lat,
                                x := {mx}, y := {my}) ORDER BY wp.pos) AS ll
        FROM wp WHERE wp.way IN (SELECT way FROM closedw)
        GROUP BY wp.way)),
outr AS (SELECT rm.rel, rm.ref AS way FROM rm
         WHERE rm.rel IN (SELECT rel FROM relok)
           AND rm.mem_type = 'way' AND rm.role != 'inner'),
innr AS (SELECT rm.rel, rm.ref AS way FROM rm
         WHERE rm.rel IN (SELECT rel FROM relok)
           AND rm.mem_type = 'way' AND rm.role = 'inner'),
contained AS (
  SELECT i.rel, i.way FROM innr i
  JOIN rstat ri ON ri.way = i.way
  JOIN outr o ON o.rel = i.rel
  JOIN rstat ro ON ro.way = o.way
  WHERE ro.minlon <= ri.minlon AND ro.minlat <= ri.minlat
    AND ro.maxlon >= ri.maxlon AND ro.maxlat >= ri.maxlat
    AND {pnp})
SELECT o.rel AS id, count(*) AS n_parts,
       (SELECT count(DISTINCT c.way) FROM contained c
        WHERE c.rel = o.rel) AS n_interiors,
       round(sum(abs(ro.sarea)) - coalesce(
         (SELECT sum(abs(ri.sarea)) FROM
            (SELECT DISTINCT c2.rel, c2.way FROM contained c2) c
          JOIN rstat ri ON ri.way = c.way WHERE c.rel = o.rel), 0.0), 1) AS area
FROM outr o JOIN rstat ro ON ro.way = o.way
GROUP BY o.rel"""


def q_multipolygons_merged(docs_path: str, style: GeometryStyle) -> str:
    """Merged-ring multipolygon oracle (J2/G7/G8): extends the
    closed-rings pin to relations whose role groups MERGE open member
    ways into rings.  Order-free reformulation of the greedy merge:

      * ring membership: a RECURSIVE cycle walk per role group —
        seeded at every open member way, stepping to the unique unused
        way sharing the current endpoint, completing when it returns
        home; each cycle is kept once (seed == min member way).
        Restricted to groups whose endpoint-node degree is <= 2 (the
        walk is then deterministic and equals the reference's greedy
        merge up to direction; degree-3+ junctions are stream-order
        ambiguous and excluded on BOTH sides).
      * ring area: the shoelace of a merged cycle = Σ ±(per-way
        partial sums), sign = traversal direction — junction-repeated
        points contribute zero, so no assembled point list is needed.
      * containment: pnpoly crossing PARITY is a sum over the ring's
        edge SET (order-free), evaluated per member way; the inner
        test point is any inner-ring vertex (first point of its min
        way).

    Output matches the Spark side's summary: (id, n_parts,
    n_interiors, area 1dp)."""
    mp_types = (["multipolygon", "boundary"] if style.boundary_relations
                else ["multipolygon"])
    types = ", ".join(_lit(t) for t in mp_types)
    mx = merc_x("wp.lon")
    my = merc_y("wp.lat")
    # per-way pnpoly crossing count vs a test point (tx, ty int cols):
    # same float arithmetic as kernels.geomcalc.points_in_ring
    cross_cnt = (
        "len(list_filter(generate_series(2, len(wm2.ll)), i -> "
        "((wm2.ll[i].lat * 1e-7 > c.ty * 1e-7) != "
        " (wm2.ll[i-1].lat * 1e-7 > c.ty * 1e-7)) "
        "AND c.tx * 1e-7 < "
        "(wm2.ll[i-1].lon * 1e-7 - wm2.ll[i].lon * 1e-7) * "
        "(c.ty * 1e-7 - wm2.ll[i].lat * 1e-7) / "
        "(wm2.ll[i-1].lat * 1e-7 - wm2.ll[i].lat * 1e-7) + "
        "wm2.ll[i].lon * 1e-7))")
    return f"""WITH RECURSIVE {base_ctes(docs_path)}, {_way_pts(style)},
wm AS MATERIALIZED (
  SELECT way, ll, f, l,
         list_sum(list_transform(generate_series(1, len(ll) - 1),
             i -> ll[i].x * ll[i+1].y - ll[i].y * ll[i+1].x)) AS partial,
         list_min(list_transform(ll, p -> p.lon)) AS minlon,
         list_min(list_transform(ll, p -> p.lat)) AS minlat,
         list_max(list_transform(ll, p -> p.lon)) AS maxlon,
         list_max(list_transform(ll, p -> p.lat)) AS maxlat,
         ll[1].lon AS p1lon, ll[1].lat AS p1lat
  FROM (SELECT wp.way, wstat.f, wstat.l,
               list(struct_pack(lon := wp.lon, lat := wp.lat,
                                x := {mx}, y := {my}) ORDER BY wp.pos) AS ll
        FROM wp JOIN wstat ON wstat.way = wp.way
        WHERE wp.way IN (SELECT way FROM wok)
        GROUP BY wp.way, wstat.f, wstat.l)),
relgood AS (
  SELECT rm.rel FROM rm GROUP BY rm.rel
  HAVING count(*) = sum(CASE WHEN mem_type = 'way' THEN 1 ELSE 0 END)
     AND sum(CASE WHEN role != 'inner' THEN 1 ELSE 0 END) >= 1
     AND sum(CASE WHEN mem_type = 'way'
              AND ref IN (SELECT way FROM wm) THEN 1 ELSE 0 END) = count(*)),
relok AS (
  SELECT rel FROM relgood
  WHERE EXISTS (SELECT 1 FROM tg WHERE tg.elem = 'rel' AND tg.id = rel
                AND tg.k = 'type' AND tg.v IN ({types}))
    AND {feature_exists(style, 'rel', 'rel')}),
memb AS MATERIALIZED (
  SELECT DISTINCT rm.rel, CASE WHEN rm.role = 'inner' THEN 'i' ELSE 'o' END
           AS grp, rm.ref AS way
  FROM rm WHERE rm.rel IN (SELECT rel FROM relok) AND rm.mem_type = 'way'),
open_m AS MATERIALIZED (SELECT memb.*, wm.f, wm.l, wm.partial
           FROM memb JOIN wm ON wm.way = memb.way WHERE wm.f != wm.l),
closed_m AS MATERIALIZED (SELECT memb.* FROM memb JOIN wm ON wm.way = memb.way
             WHERE wm.f = wm.l),
-- degree-2 restriction: any endpoint used by 3+ open ways in a group
-- makes the merge stream-order ambiguous -> drop the relation
degbad AS (
  SELECT DISTINCT rel FROM (
    SELECT rel, grp, node, count(*) AS deg FROM (
      SELECT rel, grp, f AS node FROM open_m
      UNION ALL SELECT rel, grp, l AS node FROM open_m)
    GROUP BY rel, grp, node HAVING count(*) > 2)),
relfin AS (SELECT rel FROM relok WHERE rel NOT IN (SELECT rel FROM degbad)),
walk(rel, grp, start, cur_node, home, used, acc) AS (
  SELECT rel, grp, way, l, f, [way], partial
  FROM open_m WHERE rel IN (SELECT rel FROM relfin)
  UNION ALL
  SELECT w.rel, w.grp, w.start,
         CASE WHEN m.f = w.cur_node THEN m.l ELSE m.f END,
         w.home, list_append(w.used, m.way),
         w.acc + CASE WHEN m.f = w.cur_node THEN m.partial
                      ELSE -m.partial END
  FROM walk w JOIN open_m m
    ON m.rel = w.rel AND m.grp = w.grp
   AND m.way > w.start  -- a kept cycle has start = min(used): walks
                        -- touching a smaller way can never be kept
   AND NOT list_contains(w.used, m.way)
   AND (m.f = w.cur_node OR m.l = w.cur_node)
  WHERE w.cur_node != w.home),
cycles AS (
  SELECT rel, grp, start AS ring, used, -0.5 * acc AS sarea
  FROM walk WHERE cur_node = home AND start = list_min(used)),
rings AS MATERIALIZED (
  SELECT c.rel, c.grp, c.way AS ring, [c.way] AS used,
         -0.5 * wm.partial AS sarea,
         wm.minlon, wm.minlat, wm.maxlon, wm.maxlat,
         wm.p1lon AS tx, wm.p1lat AS ty
  FROM closed_m c JOIN wm ON wm.way = c.way
  WHERE c.rel IN (SELECT rel FROM relfin)
  UNION ALL
  SELECT cy.rel, cy.grp, cy.ring, cy.used, cy.sarea,
         min(wm.minlon), min(wm.minlat), max(wm.maxlon), max(wm.maxlat),
         arg_min(wm.p1lon, wm.way), arg_min(wm.p1lat, wm.way)
  FROM cycles cy, unnest(cy.used) AS u(w)
  JOIN wm ON wm.way = u.w
  GROUP BY cy.rel, cy.grp, cy.ring, cy.used, cy.sarea),
ring_ways AS MATERIALIZED (
  SELECT rel, grp, ring, unnest(used) AS w FROM rings),
cand_io AS MATERIALIZED (
  SELECT ri.rel, ri.ring AS iring, ro.ring AS oring, ri.tx, ri.ty
  FROM rings ri JOIN rings ro ON ro.rel = ri.rel AND ro.grp = 'o'
  WHERE ri.grp = 'i'
    AND ro.minlon <= ri.minlon AND ro.minlat <= ri.minlat
    AND ro.maxlon >= ri.maxlon AND ro.maxlat >= ri.maxlat),
contained AS MATERIALIZED (
  SELECT DISTINCT rel, iring AS ring FROM (
    SELECT c.rel, c.iring, c.oring, sum({cross_cnt}) AS n
    FROM cand_io c
    JOIN ring_ways rw ON rw.rel = c.rel AND rw.grp = 'o'
                     AND rw.ring = c.oring
    JOIN wm wm2 ON wm2.way = rw.w
    GROUP BY c.rel, c.iring, c.oring)
  WHERE n % 2 = 1),
bbx AS (
  SELECT rel, min(minlon) AS bl, min(minlat) AS bb,
         max(maxlon) AS br, max(maxlat) AS bt
  FROM rings WHERE grp = 'o' GROUP BY rel),
-- calculate_bbox(exterior bounds): corner cells at depth 18, rounded
-- to the deepest depth at which both corners share a tile
qtc AS (
  SELECT rel, {sql_point_qt('bl', 'bb')} AS qa,
         {_sql_tile_x('bl', 1 << 18)} AS txa,
         {_sql_tile_y('bb', 1 << 18)} AS tya,
         {_sql_tile_x('br', 1 << 18)} AS txb,
         {_sql_tile_y('bt', 1 << 18)} AS tyb
  FROM bbx),
qtr AS (
  SELECT rel, {sql_round_qt('qa', 'cd')} AS quadtree FROM (
    SELECT rel, qa,
           list_max(list_filter(generate_series(0, 18), dd ->
             floor(txa / power(2, 18 - dd)) = floor(txb / power(2, 18 - dd))
             AND floor(tya / power(2, 18 - dd)) = floor(tyb / power(2, 18 - dd))))
             AS cd
    FROM qtc))
SELECT r.rel AS id, count(*) AS n_parts,
       (SELECT count(*) FROM contained c WHERE c.rel = r.rel) AS n_interiors,
       round(sum(abs(r.sarea)) - coalesce(
         (SELECT sum(abs(ri.sarea)) FROM contained c
          JOIN rings ri ON ri.rel = c.rel AND ri.ring = c.ring
                       AND ri.grp = 'i'
          WHERE c.rel = r.rel), 0.0), 1) AS area,
       any_value(qtr.quadtree) AS quadtree
FROM rings r JOIN qtr ON qtr.rel = r.rel
WHERE r.grp = 'o'
GROUP BY r.rel"""


def _mz_lookup_sql(table: dict, elem: str, id_expr: str) -> str:
    """Min matching minzoom rule over the tg CTE (exact k=v rules beat
    k=* rules per tag; min across tags)."""
    exact = [((k, v), z) for (k, v), z in table.items() if v != "*"]
    stars = [(k, z) for (k, v), z in table.items() if v == "*"]
    e_cases = " ".join(
        f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
        for (k, v), z in exact) or "WHEN false THEN 0"
    s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}"
                       for k, z in stars) or "WHEN false THEN 0"
    return (f"(SELECT min(coalesce(CASE {e_cases} ELSE NULL END, "
            f"CASE {s_cases} ELSE NULL END)) FROM tg "
            f"WHERE tg.elem = '{elem}' AND tg.id = {id_expr})")


def _poly_mz_sql(spec: MinZoomSpec, base: str, area: str) -> str:
    """Polygon minzoom = max(rule minzoom, area floor) — the zoom at
    which the polygon covers >= min_area px² (config/minzoom.py)."""
    from .config.minzoom import MAX_MINZOOM
    floor_ = (f"least(CAST({MAX_MINZOOM} AS BIGINT), CAST(floor(CASE "
              f"WHEN abs(sqrt(({area}) / {spec.min_area})) < 0.001 THEN 20.0 "
              f"ELSE log2({EARTH_WIDTH!r} * 2.0 / sqrt(({area}) / {spec.min_area}) "
              f"/ 256.0) END) AS BIGINT))")
    return (f"(CASE WHEN ({base}) IS NULL THEN NULL "
            f"ELSE greatest({base}, {floor_}) END)")


def q_multipolygons_full(docs_path: str, style: GeometryStyle,
                         spec: MinZoomSpec | None = None) -> str:
    """FULL multipolygon assembly-digest oracle (round-2 verdict
    Missing #2 / Next #5): unlike ``q_multipolygons_merged`` it does
    NOT restrict to all-members-resolvable relations — missing member
    ways are simply skipped (the pipeline's inner-join ``wnas`` path,
    multipolygons.rs:232-237) — and it replicates order_rings' full
    part construction (multipolygons.rs:19-77):

      * outer-role rings CONTAINED in a larger outer ring are demoted
        to interiors of it (engine: _add_ring tests each area-sorted
        ring against already-placed exteriors);
      * contained rings attach to the LARGEST containing top-level
        part (res is built in decreasing-area order, first hit wins);
      * inner rings contained in no top-level part are dropped.

    Digest values are EXACT int64: |2*shoelace| of each ring in raw
    1e-7-degree coords, computed from per-way partial sums over a
    relation-local origin (translation-invariant, so the Spark side's
    per-ring origin yields the identical integer).  Exactness bound:
    intermediates stay in int64 while a relation's coordinate extent
    is < ~6e7 units (~6 deg) for 1k-point rings — documented, holds
    for every fixture scene.  Rings are identified by a
    rotation/direction-invariant anchor (packed lexicographic-min
    vertex); parts sort canonically by (-|2A|, anchor, npts, str).
    No float ever reaches the value hash."""
    mp_types = (["multipolygon", "boundary"] if style.boundary_relations
                else ["multipolygon"])
    types = ", ".join(_lit(t) for t in mp_types)
    mx = merc_x("wp.lon")
    my = merc_y("wp.lat")
    # pnpoly crossing count of one member way's edges vs test point
    # (tx, ty) — same float arithmetic as kernels.geomcalc.points_in_ring
    cross = (
        "len(list_filter(generate_series(2, len(wl.ll)), i -> "
        "((wl.ll[i].lat * 1e-7 > a.ty * 1e-7) != "
        " (wl.ll[i-1].lat * 1e-7 > a.ty * 1e-7)) "
        "AND a.tx * 1e-7 < "
        "(wl.ll[i-1].lon * 1e-7 - wl.ll[i].lon * 1e-7) * "
        "(a.ty * 1e-7 - wl.ll[i].lat * 1e-7) / "
        "(wl.ll[i-1].lat * 1e-7 - wl.ll[i].lat * 1e-7) + "
        "wl.ll[i].lon * 1e-7))")
    rstr = "r.npts || ':' || r.anchor || ':' || r.a2"
    mzq = ("NULL" if spec is None else _poly_mz_sql(
        spec, _mz_lookup_sql(spec.polygons, "rel", "q.rel"), "ra.marea"))
    return f"""WITH RECURSIVE {base_ctes(docs_path)}, {_way_pts(style)},
wmg AS MATERIALIZED (  -- per-way geometry: merc partial, bbox, anchor, first point
  SELECT way, ll, f, l, len(ll) AS npts,
         list_sum(list_transform(generate_series(1, len(ll) - 1),
             i -> ll[i].x * ll[i+1].y - ll[i].y * ll[i+1].x)) AS partial,
         list_min(list_transform(ll, p -> p.lon)) AS minlon,
         list_min(list_transform(ll, p -> p.lat)) AS minlat,
         list_max(list_transform(ll, p -> p.lon)) AS maxlon,
         list_max(list_transform(ll, p -> p.lat)) AS maxlat,
         list_min(list_transform(ll, p -> cast(p.lon AS bigint) * 4294967296
             + (cast(p.lat AS bigint) + 2147483648))) AS anchor,
         ll[1].lon AS p1lon, ll[1].lat AS p1lat
  FROM (SELECT wp.way, wstat.f, wstat.l,
               list(struct_pack(lon := wp.lon, lat := wp.lat,
                                x := {mx}, y := {my}) ORDER BY wp.pos) AS ll
        FROM wp JOIN wstat ON wstat.way = wp.way
        WHERE wp.way IN (SELECT way FROM wok)
        GROUP BY wp.way, wstat.f, wstat.l)),
relok AS (
  SELECT DISTINCT tg.id AS rel FROM tg
  WHERE tg.elem = 'rel' AND tg.k = 'type' AND tg.v IN ({types})
    AND {feature_exists(style, 'rel', 'tg.id')}),
memb AS (  -- resolvable member ways only; missing ones skipped
  SELECT DISTINCT rm.rel,
         CASE WHEN rm.role = 'inner' THEN 'i' ELSE 'o' END AS grp,
         rm.ref AS way
  FROM rm WHERE rm.rel IN (SELECT rel FROM relok)
    AND rm.mem_type = 'way' AND rm.ref IN (SELECT way FROM wmg)),
relo AS MATERIALIZED (  -- relation-local origin for exact int64 shoelaces
  SELECT m.rel, min(g.minlon) AS olon, min(g.minlat) AS olat
  FROM memb m JOIN wmg g ON g.way = m.way GROUP BY m.rel),
wmx AS MATERIALIZED (  -- per (rel, way): exact raw-int directed 2*shoelace partial
  SELECT m.rel, m.grp, m.way, g.f, g.l, g.npts, g.partial, g.anchor,
         g.minlon, g.minlat, g.maxlon, g.maxlat, g.p1lon, g.p1lat,
         list_sum(list_transform(generate_series(1, len(g.ll) - 1), i ->
             (cast(g.ll[i].lon AS bigint) - o.olon)
               * (cast(g.ll[i+1].lat AS bigint) - o.olat)
             - (cast(g.ll[i].lat AS bigint) - o.olat)
               * (cast(g.ll[i+1].lon AS bigint) - o.olon))) AS i2a
  FROM memb m JOIN wmg g ON g.way = m.way JOIN relo o ON o.rel = m.rel),
open_m AS MATERIALIZED (SELECT * FROM wmx WHERE f != l),
closed_m AS (SELECT * FROM wmx WHERE f = l),
-- Degree split (round-4: mega-relation scalability).  In a group
-- whose every endpoint node touches <= 2 open ways, the walk is
-- DETERMINISTIC: the only unused candidate at each step is the one
-- way that is not the way we just arrived on, so excluding the
-- previous way is exactly equivalent to the visited-list check and
-- the walk carries O(1) state — a 10^4-way coastline chain costs
-- O(chain^2) cheap rows instead of O(chain^3) list scans.  Groups
-- with a degree-3+ junction (branching) keep the visited-list walk.
hardg AS MATERIALIZED (
  SELECT DISTINCT rel, grp FROM (
    SELECT rel, grp, node FROM (
      SELECT rel, grp, f AS node FROM open_m
      UNION ALL SELECT rel, grp, l AS node FROM open_m)
    GROUP BY rel, grp, node HAVING count(*) > 2)),
open_s AS MATERIALIZED (
  SELECT o.* FROM open_m o
  WHERE NOT EXISTS (SELECT 1 FROM hardg h
                    WHERE h.rel = o.rel AND h.grp = o.grp)),
open_h AS MATERIALIZED (
  SELECT o.* FROM open_m o
  WHERE EXISTS (SELECT 1 FROM hardg h
                WHERE h.rel = o.rel AND h.grp = o.grp)),
walk(rel, grp, start, cur_node, home, used, acc, acc2) AS (
  SELECT rel, grp, way, l, f, [way], partial, i2a FROM open_h
  UNION ALL
  SELECT w.rel, w.grp, w.start,
         CASE WHEN m.f = w.cur_node THEN m.l ELSE m.f END,
         w.home, list_append(w.used, m.way),
         w.acc + CASE WHEN m.f = w.cur_node THEN m.partial
                      ELSE -m.partial END,
         w.acc2 + CASE WHEN m.f = w.cur_node THEN m.i2a ELSE -m.i2a END
  FROM walk w JOIN open_h m
    ON m.rel = w.rel AND m.grp = w.grp
   AND m.way > w.start  -- min-start prune (see q_multipolygons_merged)
   AND NOT list_contains(w.used, m.way)
   AND (m.f = w.cur_node OR m.l = w.cur_node)
  WHERE w.cur_node != w.home),
walks(rel, grp, start, cur_node, home, prev, acc, acc2) AS (
  -- seed prune (exact for degree<=2 groups): a kept cycle's start is
  -- the component min, and in a simple cycle both ways adjacent to
  -- the start belong to the cycle — so a way with a SMALLER-id
  -- adjacent way can never seed a kept walk.  An in-id-order chain
  -- (the typical coastline ingest) seeds exactly once.
  SELECT o.rel, o.grp, o.way, o.l, o.f, o.way, o.partial, o.i2a
  FROM open_s o
  WHERE NOT EXISTS (SELECT 1 FROM open_s m
                    WHERE m.rel = o.rel AND m.grp = o.grp
                      AND m.way < o.way
                      AND (m.f IN (o.f, o.l) OR m.l IN (o.f, o.l)))
  UNION ALL
  SELECT w.rel, w.grp, w.start,
         CASE WHEN m.f = w.cur_node THEN m.l ELSE m.f END,
         w.home, m.way,
         w.acc + CASE WHEN m.f = w.cur_node THEN m.partial
                      ELSE -m.partial END,
         w.acc2 + CASE WHEN m.f = w.cur_node THEN m.i2a ELSE -m.i2a END
  FROM walks w JOIN open_s m
    ON m.rel = w.rel AND m.grp = w.grp
   AND m.way > w.start  -- min-start prune: implies start = min(ways)
   AND m.way != w.prev  -- degree<=2: equivalent to the visited list
   AND (m.f = w.cur_node OR m.l = w.cur_node)
  WHERE w.cur_node != w.home),
cycles AS (
  SELECT rel, grp, start AS ring, -0.5 * acc AS sarea, abs(acc2) AS a2
  FROM walk WHERE cur_node = home AND start = list_min(used)
  UNION ALL
  SELECT rel, grp, start, -0.5 * acc, abs(acc2)
  FROM walks WHERE cur_node = home),
cycle_ways AS MATERIALIZED (  -- merged-cycle ring membership
  SELECT rel, grp, start AS ring, unnest(used) AS way
  FROM walk WHERE cur_node = home AND start = list_min(used)
  UNION ALL
  -- every row of a completed simple walk added exactly one way (prev)
  SELECT w.rel, w.grp, w.start AS ring, w.prev AS way
  FROM walks w
  JOIN (SELECT DISTINCT rel, grp, start FROM walks
        WHERE cur_node = home) c
    ON c.rel = w.rel AND c.grp = w.grp AND c.start = w.start),
rings AS MATERIALIZED (  -- (rel, grp, ring): closed single ways + merged cycles
  SELECT c.rel, c.grp, c.way AS ring,
         -0.5 * c.partial AS sarea, abs(c.i2a) AS a2,
         cast(c.npts AS bigint) AS npts, c.anchor,
         c.minlon, c.minlat, c.maxlon, c.maxlat,
         c.p1lon AS tx, c.p1lat AS ty
  FROM closed_m c
  UNION ALL
  SELECT cy.rel, cy.grp, cy.ring, cy.sarea, cy.a2,
         cast(sum(w.npts - 1) + 1 AS bigint), min(w.anchor),
         min(w.minlon), min(w.minlat), max(w.maxlon), max(w.maxlat),
         arg_min(w.p1lon, w.way), arg_min(w.p1lat, w.way)
  FROM cycles cy
  JOIN cycle_ways cw ON cw.rel = cy.rel AND cw.grp = cy.grp
                    AND cw.ring = cy.ring
  JOIN wmx w ON w.rel = cy.rel AND w.grp = cy.grp AND w.way = cw.way
  GROUP BY cy.rel, cy.grp, cy.ring, cy.sarea, cy.a2),
ring_ways AS (
  SELECT rel, grp, way AS ring, way AS w FROM closed_m
  UNION ALL SELECT rel, grp, ring, way AS w FROM cycle_ways),
cpairs AS MATERIALIZED (  -- candidate containment: any ring vs strictly larger outer
  SELECT a.rel, a.agrp, a.aring, a.bring, a.bsz, sum({cross}) AS ncross
  FROM (SELECT a.rel, a.grp AS agrp, a.ring AS aring, b.ring AS bring,
               abs(b.sarea) AS bsz, a.tx, a.ty
        FROM rings a JOIN rings b
          ON b.rel = a.rel AND b.grp = 'o'
         AND abs(b.sarea) > abs(a.sarea)
         AND NOT (a.grp = 'o' AND a.ring = b.ring)
         AND b.minlon <= a.minlon AND b.minlat <= a.minlat
         AND b.maxlon >= a.maxlon AND b.maxlat >= a.maxlat) a
  JOIN ring_ways rwb ON rwb.rel = a.rel AND rwb.grp = 'o'
                    AND rwb.ring = a.bring
  JOIN (SELECT way, ll FROM wmg) wl ON wl.way = rwb.w
  GROUP BY a.rel, a.agrp, a.aring, a.bring, a.bsz),
cont AS MATERIALIZED (SELECT rel, agrp, aring, bring, bsz FROM cpairs
         WHERE ncross % 2 = 1),
demoted AS (SELECT DISTINCT rel, aring AS ring FROM cont WHERE agrp = 'o'),
tl AS MATERIALIZED (  -- top-level parts: outer rings not contained in a larger outer
  SELECT r.* FROM rings r
  WHERE r.grp = 'o' AND NOT EXISTS (
    SELECT 1 FROM demoted d WHERE d.rel = r.rel AND d.ring = r.ring)),
asg AS MATERIALIZED (  -- contained ring -> largest containing TOP-LEVEL part
  SELECT c.rel, c.agrp, c.aring, arg_max(c.bring, c.bsz) AS host
  FROM cont c JOIN tl t ON t.rel = c.rel AND t.ring = c.bring
  GROUP BY c.rel, c.agrp, c.aring),
istr AS (  -- per host part: sorted interior digest + exact area sum
  SELECT a.rel, a.host,
         string_agg({rstr}, ',' ORDER BY -r.a2, r.anchor, r.npts) AS s,
         cast(sum(r.a2) AS bigint) AS suma2,
         cast(count(*) AS bigint) AS n_int
  FROM asg a JOIN rings r ON r.rel = a.rel AND r.grp = a.agrp
                         AND r.ring = a.aring
  GROUP BY a.rel, a.host),
pstr AS (  -- per top-level part: digest string + canonical sort keys
  SELECT t.rel, -t.a2 AS k1, t.anchor AS k2, t.npts AS k3,
         t.npts || ':' || t.anchor || ':' || t.a2 || '[' ||
           coalesce(i.s, '') || ']' AS s,
         t.a2 - coalesce(i.suma2, 0) AS parta2,
         coalesce(i.n_int, 0) AS n_int
  FROM tl t LEFT JOIN istr i ON i.rel = t.rel AND i.host = t.ring),
bbx AS (SELECT rel, min(minlon) AS bl, min(minlat) AS bb,
               max(maxlon) AS br, max(maxlat) AS bt
        FROM tl GROUP BY rel),
qtr AS (  -- calculate_bbox over top-level exterior bounds
  SELECT rel, {sql_round_qt('qa', 'cd')} AS q0 FROM (
    SELECT rel, {sql_point_qt('bl', 'bb')} AS qa,
           list_max(list_filter(generate_series(0, 18), dd ->
             floor({_sql_tile_x('bl', 1 << 18)} / power(2, 18 - dd))
               = floor({_sql_tile_x('br', 1 << 18)} / power(2, 18 - dd))
             AND floor({_sql_tile_y('bb', 1 << 18)} / power(2, 18 - dd))
               = floor({_sql_tile_y('bt', 1 << 18)} / power(2, 18 - dd))))
             AS cd
    FROM bbx)),
relarea AS (  -- engine `area` column (float mercator) for the mz floor
  SELECT t.rel,
         sum(abs(t.sarea)) - coalesce((
           SELECT sum(abs(r.sarea)) FROM asg a
           JOIN rings r ON r.rel = a.rel AND r.grp = a.agrp
                       AND r.ring = a.aring
           WHERE a.rel = t.rel), 0.0) AS marea
  FROM tl t GROUP BY t.rel),
qfin AS (  -- pipeline minzoom rounding (operators/minzoom.py _apply)
  SELECT rel, CASE WHEN mz IS NULL THEN q0
              ELSE {sql_round_qt('q0', 'mz')} END AS quadtree
  FROM (SELECT q.rel, q.q0, {mzq} AS mz
        FROM qtr q JOIN relarea ra ON ra.rel = q.rel))
SELECT p.rel AS id, cast(count(*) AS bigint) AS n_parts,
       cast(sum(p.n_int) AS bigint) AS n_interiors,
       cast(sum(p.parta2) AS bigint) AS area2_raw,
       any_value(q.quadtree) AS quadtree,
       md5(string_agg(p.s, ';' ORDER BY p.k1, p.k2, p.k3, p.s))
         AS parts_digest
FROM pstr p JOIN qfin q ON q.rel = p.rel
GROUP BY p.rel"""


def q_assembly_errors(docs_path: str, style: GeometryStyle) -> str:
    """Pipeline error side-output oracle, grouped (elem_type, message):

      * way / 'missing node <ref>' — first missing ref per way
        (waywithnodes.rs:105-109, same derivation as waynode_errors);
      * relation / 'not a feature' — mp-typed relations without a
        feature key (style.rs:318-331);
      * relation / 'no rings' — mp feature relations whose resolvable
        members yield neither a closed-way ring nor a completed merge
        cycle (rings.py 'no rings', AssemblyError).  Cycle existence
        re-derived with the recursive endpoint walk; at degree-3+
        junctions greedy merge order could in principle differ from
        the walk, but cycle EXISTENCE matches on every degree<=2
        group (all fixture scenes)."""
    mp_types = (["multipolygon", "boundary"] if style.boundary_relations
                else ["multipolygon"])
    types = ", ".join(_lit(t) for t in mp_types)
    return f"""WITH RECURSIVE {base_ctes(docs_path)},
wok AS (SELECT wr.way FROM wr LEFT JOIN nd ON wr.ref = nd.id
        GROUP BY wr.way HAVING count(nd.id) = count(*)),
wend AS (SELECT way, min_by(ref, pos) AS f, max_by(ref, pos) AS l
         FROM wr WHERE way IN (SELECT way FROM wok) GROUP BY way),
mprel AS (
  SELECT DISTINCT tg.id AS rel FROM tg
  WHERE tg.elem = 'rel' AND tg.k = 'type' AND tg.v IN ({types})),
mpfeat AS (SELECT rel FROM mprel
           WHERE {feature_exists(style, 'rel', 'rel')}),
open_m AS (
  SELECT DISTINCT rm.rel, rm.ref AS way, wend.f, wend.l
  FROM rm JOIN wend ON wend.way = rm.ref
  WHERE rm.rel IN (SELECT rel FROM mpfeat) AND rm.mem_type = 'way'
    AND wend.f != wend.l),
haveclosed AS (
  SELECT DISTINCT rm.rel FROM rm JOIN wend ON wend.way = rm.ref
  WHERE rm.rel IN (SELECT rel FROM mpfeat) AND rm.mem_type = 'way'
    AND wend.f = wend.l),
walk(rel, start, cur_node, home, used) AS (
  SELECT rel, way, l, f, [way] FROM open_m
  UNION ALL
  SELECT w.rel, w.start,
         CASE WHEN m.f = w.cur_node THEN m.l ELSE m.f END,
         w.home, list_append(w.used, m.way)
  FROM walk w JOIN open_m m
    ON m.rel = w.rel AND m.way > w.start  -- min-start prune: cycle
                        -- existence is still found from its min seed
   AND NOT list_contains(w.used, m.way)
   AND (m.f = w.cur_node OR m.l = w.cur_node)
  WHERE w.cur_node != w.home),
havecycle AS (SELECT DISTINCT rel FROM walk WHERE cur_node = home),
errs AS (
  SELECT 'way' AS elem_type, wr.way AS elem_id,
         'missing node ' || min_by(wr.ref, wr.pos) AS message
  FROM wr LEFT JOIN nd ON wr.ref = nd.id
  WHERE nd.id IS NULL GROUP BY wr.way
  UNION ALL
  SELECT 'relation', rel, 'not a feature' FROM mprel
  WHERE rel NOT IN (SELECT rel FROM mpfeat)
  UNION ALL
  SELECT 'relation', rel, 'no rings' FROM mpfeat
  WHERE rel NOT IN (SELECT rel FROM haveclosed)
    AND rel NOT IN (SELECT rel FROM havecycle))
SELECT elem_type, message, count(*) AS n, min(elem_id) AS min_id
FROM errs GROUP BY elem_type, message"""


def q_feature_tile_counts(docs_path: str, style: GeometryStyle,
                          spec: MinZoomSpec, group_depth: int = 8) -> str:
    """THE FLAGSHIP (entry()) oracle: per-(geom_type, tile) feature
    counts + id ranges across ALL FOUR geometry outputs.  Composes the
    proven pieces end-to-end — feature-node minzoom+cells (G10/G14),
    way bbox cells + line/polygon minzoom with the area floor, the
    merged-ring relation walk (rings, winding-normalized area,
    exterior-bbox quadtree), minzoom rounding, and the
    deepest-registered-ancestor tile allocation — into one SQL
    statement.  Assumes degree<=2 merge junctions (every fixture
    scene; 3+ is stream-order ambiguous in the reference too)."""
    mp_types = (["multipolygon", "boundary"] if style.boundary_relations
                else ["multipolygon"])
    types = ", ".join(_lit(t) for t in mp_types)
    is_poly = polygon_match(style, "wstat.way")
    d = str(group_depth)
    qt18 = sql_point_qt("nd.lon", "nd.lat")
    from .config.minzoom import MAX_MINZOOM
    from .kernels.mercator import EARTH_WIDTH as EW

    def mz_lookup(table: dict, elem: str, id_expr: str) -> str:
        exact = [((k, v), z) for (k, v), z in table.items() if v != "*"]
        stars = [(k, z) for (k, v), z in table.items() if v == "*"]
        e_cases = " ".join(
            f"WHEN tg.k = {_lit(k)} AND tg.v = {_lit(v)} THEN {z}"
            for (k, v), z in exact) or "WHEN false THEN 0"
        s_cases = " ".join(f"WHEN tg.k = {_lit(k)} THEN {z}"
                           for k, z in stars) or "WHEN false THEN 0"
        return (f"(SELECT min(coalesce(CASE {e_cases} ELSE NULL END, "
                f"CASE {s_cases} ELSE NULL END)) FROM tg "
                f"WHERE tg.elem = '{elem}' AND tg.id = {id_expr})")

    def area_floor(area: str) -> str:
        return (f"least(CAST({MAX_MINZOOM} AS BIGINT), CAST(floor(CASE "
                f"WHEN abs(sqrt(({area}) / {spec.min_area})) < 0.001 THEN 20.0 "
                f"ELSE log2({EW!r} * 2.0 / sqrt(({area}) / {spec.min_area}) "
                f"/ 256.0) END) AS BIGINT))")

    def poly_mz(base: str, area: str) -> str:
        return (f"(CASE WHEN ({base}) IS NULL THEN NULL "
                f"ELSE greatest({base}, {area_floor(area)}) END)")

    # deepest depth at which two depth-18 corner tiles share a tile
    cdepth = ("list_max(list_filter(generate_series(0, 18), dd -> "
              "floor(txa / power(2, 18 - dd)) = floor(txb / power(2, 18 - dd))"
              " AND floor(tya / power(2, 18 - dd)) = "
              "floor(tyb / power(2, 18 - dd))))")
    r8 = sql_round_qt("quadtree", d)
    alloc = (f"CASE WHEN {sql_qt_depth('quadtree')} >= {group_depth} "
             f"AND {r8} IN (SELECT tile FROM dict) THEN {r8} ELSE -1 END")
    rmz = sql_round_qt("q0", "mz")
    return f"""WITH RECURSIVE {base_ctes(docs_path)}, {_way_pts(style)},
{_fz_cte(style, spec)},
dict AS (SELECT DISTINCT {sql_round_qt('q00', d)} AS tile
         FROM (SELECT {qt18} AS q00 FROM nd)),
-- ways: bbox cells + per-kind minzoom + rounding
wkind AS MATERIALIZED (
  SELECT wstat.way,
         (wstat.f = wstat.l AND {is_poly}) AS ispoly
  FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}),
wgeo AS MATERIALIZED (
  SELECT wp.way, min(wp.lon) AS bl, min(wp.lat) AS bb,
         max(wp.lon) AS br, max(wp.lat) AS bt,
         abs(-0.5 * sum(wp.x * wp.y2 - wp.y * wp.x2)) AS marea
  FROM (SELECT wp.way, wp.lon, wp.lat, wp.x, wp.y,
               lead(wp.x) OVER w AS x2, lead(wp.y) OVER w AS y2
        FROM wp WINDOW w AS (PARTITION BY wp.way ORDER BY wp.pos)) wp
  JOIN wkind ON wkind.way = wp.way GROUP BY wp.way),
wqt AS (
  SELECT wk.way, wk.ispoly, wg.marea,
         {sql_point_qt('wg.bl', 'wg.bb')} AS qa,
         {_sql_tile_x('wg.bl', 1 << 18)} AS txa,
         {_sql_tile_y('wg.bb', 1 << 18)} AS tya,
         {_sql_tile_x('wg.br', 1 << 18)} AS txb,
         {_sql_tile_y('wg.bt', 1 << 18)} AS tyb
  FROM wkind wk JOIN wgeo wg ON wg.way = wk.way),
wq0 AS (SELECT way, ispoly, marea,
               {sql_round_qt('qa', cdepth)} AS q0 FROM wqt),
wmz AS (
  SELECT way, ispoly, q0,
         CASE WHEN ispoly
              THEN {poly_mz(mz_lookup(spec.polygons, 'way', 'wmz0.way'),
                            'wmz0.marea')}
              ELSE {mz_lookup(spec.lines, 'way', 'wmz0.way')} END AS mz
  FROM wq0 wmz0),
wfin AS (SELECT way, ispoly,
                CASE WHEN mz IS NULL THEN q0 ELSE {rmz} END AS quadtree
         FROM wmz),
-- relations: merged-ring walk (subset of q_multipolygons_merged,
-- missing members skipped like the pipeline)
wm2 AS MATERIALIZED (
  SELECT g.way, wstat.f, wstat.l, g.sarea,
         g.bl, g.bb, g.br, g.bt, g.tx, g.ty
  FROM (SELECT way, -0.5 * sum(x * y2 - y * x2) AS sarea,
               min(lon) AS bl, min(lat) AS bb,
               max(lon) AS br, max(lat) AS bt,
               min_by(lon, pos) AS tx, min_by(lat, pos) AS ty
        FROM (SELECT wp.*, lead(wp.x) OVER w2 AS x2,
                     lead(wp.y) OVER w2 AS y2
              FROM wp WINDOW w2 AS (PARTITION BY wp.way ORDER BY wp.pos))
        GROUP BY way) g
  JOIN wstat ON wstat.way = g.way
  WHERE g.way IN (SELECT way FROM wok)),
relok2 AS (
  SELECT DISTINCT tg.id AS rel FROM tg
  WHERE tg.elem = 'rel' AND tg.k = 'type' AND tg.v IN ({types})
    AND {feature_exists(style, 'rel', 'tg.id')}),
memb2 AS (
  SELECT DISTINCT rm.rel,
         CASE WHEN rm.role = 'inner' THEN 'i' ELSE 'o' END AS grp,
         rm.ref AS way
  FROM rm WHERE rm.rel IN (SELECT rel FROM relok2)
    AND rm.mem_type = 'way' AND rm.ref IN (SELECT way FROM wm2)),
open2 AS MATERIALIZED (SELECT memb2.*, wm2.f, wm2.l, wm2.sarea
          FROM memb2 JOIN wm2 ON wm2.way = memb2.way WHERE wm2.f != wm2.l),
closed2 AS MATERIALIZED (SELECT memb2.* FROM memb2 JOIN wm2 ON wm2.way = memb2.way
            WHERE wm2.f = wm2.l),
walk2(rel, grp, start, cur_node, home, used, acc) AS (
  SELECT rel, grp, way, l, f, [way], sarea FROM open2
  UNION ALL
  SELECT w.rel, w.grp, w.start,
         CASE WHEN m.f = w.cur_node THEN m.l ELSE m.f END,
         w.home, list_append(w.used, m.way),
         w.acc + CASE WHEN m.f = w.cur_node THEN m.sarea ELSE -m.sarea END
  FROM walk2 w JOIN open2 m
    ON m.rel = w.rel AND m.grp = w.grp
   AND m.way > w.start  -- min-start prune (see q_multipolygons_merged)
   AND NOT list_contains(w.used, m.way)
   AND (m.f = w.cur_node OR m.l = w.cur_node)
  WHERE w.cur_node != w.home),
cyc2 AS (SELECT rel, grp, start AS ring, used, acc AS sarea
         FROM walk2 WHERE cur_node = home AND start = list_min(used)),
rng2 AS MATERIALIZED (
  SELECT c.rel, c.grp, c.way AS ring, [c.way] AS used, wm2.sarea,
         wm2.bl, wm2.bb, wm2.br, wm2.bt, wm2.tx, wm2.ty
  FROM closed2 c JOIN wm2 ON wm2.way = c.way
  UNION ALL
  SELECT cy.rel, cy.grp, cy.ring, cy.used, cy.sarea,
         min(wm2.bl), min(wm2.bb), max(wm2.br), max(wm2.bt),
         arg_min(wm2.tx, wm2.way), arg_min(wm2.ty, wm2.way)
  FROM cyc2 cy, unnest(cy.used) AS u(w) JOIN wm2 ON wm2.way = u.w
  GROUP BY cy.rel, cy.grp, cy.ring, cy.used, cy.sarea),
rw2 AS MATERIALIZED (SELECT rel, grp, ring, unnest(used) AS w FROM rng2),
cio2 AS MATERIALIZED (
  SELECT ri.rel, ri.ring AS iring, ro.ring AS oring, ri.tx, ri.ty
  FROM rng2 ri JOIN rng2 ro ON ro.rel = ri.rel AND ro.grp = 'o'
  WHERE ri.grp = 'i'
    AND ro.bl <= ri.bl AND ro.bb <= ri.bb
    AND ro.br >= ri.br AND ro.bt >= ri.bt),
cont2 AS MATERIALIZED (
  SELECT DISTINCT rel, iring AS ring FROM (
    SELECT c.rel, c.iring, c.oring,
           sum(len(list_filter(generate_series(2, len(wl.ll)), i ->
             ((wl.ll[i].lat * 1e-7 > c.ty * 1e-7) !=
              (wl.ll[i-1].lat * 1e-7 > c.ty * 1e-7))
             AND c.tx * 1e-7 <
               (wl.ll[i-1].lon * 1e-7 - wl.ll[i].lon * 1e-7) *
               (c.ty * 1e-7 - wl.ll[i].lat * 1e-7) /
               (wl.ll[i-1].lat * 1e-7 - wl.ll[i].lat * 1e-7) +
               wl.ll[i].lon * 1e-7))) AS n
    FROM cio2 c
    JOIN rw2 ON rw2.rel = c.rel AND rw2.grp = 'o' AND rw2.ring = c.oring
    JOIN (SELECT wp.way, list(struct_pack(lon := wp.lon, lat := wp.lat)
                              ORDER BY wp.pos) AS ll
          FROM wp GROUP BY wp.way) wl ON wl.way = rw2.w
    GROUP BY c.rel, c.iring, c.oring)
  WHERE n % 2 = 1),
rsum AS (
  SELECT r.rel,
         sum(abs(r.sarea)) - coalesce(
           (SELECT sum(abs(ri.sarea)) FROM cont2 c
            JOIN rng2 ri ON ri.rel = c.rel AND ri.ring = c.ring
                        AND ri.grp = 'i'
            WHERE c.rel = r.rel), 0.0) AS area,
         min(r.bl) AS bl, min(r.bb) AS bb, max(r.br) AS br, max(r.bt) AS bt
  FROM rng2 r WHERE r.grp = 'o' GROUP BY r.rel),
rqt2 AS (
  SELECT rel, area, {sql_point_qt('bl', 'bb')} AS qa,
         {_sql_tile_x('bl', 1 << 18)} AS txa,
         {_sql_tile_y('bb', 1 << 18)} AS tya,
         {_sql_tile_x('br', 1 << 18)} AS txb,
         {_sql_tile_y('bt', 1 << 18)} AS tyb
  FROM rsum),
rq0 AS (SELECT rel, area, {sql_round_qt('qa', cdepth)} AS q0 FROM rqt2),
rmz2 AS (SELECT rel, q0,
                {poly_mz(mz_lookup(spec.polygons, 'rel', 'rq.rel'), 'rq.area')}
                  AS mz
         FROM rq0 rq),
rfin AS (SELECT rel, CASE WHEN mz IS NULL THEN q0 ELSE {rmz} END AS quadtree
         FROM rmz2),
feat AS (
  SELECT 'point' AS geom_type, id, quadtree FROM fz
  UNION ALL
  SELECT CASE WHEN ispoly THEN 'simple_polygon' ELSE 'linestring' END,
         way, quadtree FROM wfin
  UNION ALL
  SELECT 'complicated_polygon', rel, quadtree FROM rfin)
SELECT geom_type, {alloc} AS tile,
       count(*) AS n_features, min(id) AS min_id, max(id) AS max_id
FROM feat GROUP BY geom_type, {alloc}"""


def _banker(x: str) -> str:
    """Round-half-even (numpy/python semantics) — DuckDB round() is
    half-away-from-zero, and int-coordinate midpoints hit .5 often."""
    f = f"floor({x})"
    fr = f"(({x}) - {f})"
    return (f"cast(({f} + CASE WHEN {fr} > 0.5 THEN 1 "
            f"WHEN {fr} < 0.5 THEN 0 "
            f"WHEN cast({f} as bigint) % 2 = 0 THEN 0 ELSE 1 END) as bigint)")


def q_polygon_validity(docs_path: str, style: GeometryStyle) -> str:
    """Mirror of operators.validity (is_valid ring test +
    point_on_surface) over the simple-polygon ways:

      is_valid  = >=4 pts AND closed AND no consecutive dupes AND
                  2dp-mercator shoelace != 0 AND no non-adjacent
                  segment intersection (float side tests, identical
                  arithmetic to kernels.geomcalc.segment_intersects)
      pos       = midpoint of the widest pnpoly crossing interval on
                  the bbox-centre-latitude scanline, round-half-even
    """
    is_poly = polygon_match(style, "wstat.way")
    # ring list + per-ring scalars
    mx = merc_x("wp.lon")
    my = merc_y("wp.lat")
    # --- is_valid pieces (over ll = list<struct(lon,lat,x,y)>) ---
    dupes = ("len(list_filter(generate_series(2, len(ll)), i -> "
             "ll[i].lon = ll[i-1].lon AND ll[i].lat = ll[i-1].lat)) > 0")
    closed = "(ll[1].lon = ll[len(ll)].lon AND ll[1].lat = ll[len(ll)].lat)"
    shoelace = ("list_sum(list_transform(generate_series(1, len(ll) - 1), "
                "i -> ll[i].x * ll[i+1].y - ll[i].y * ll[i+1].x))")
    # float side test s((p1,p2), q): sign of cross product on raw
    # int-degree coords (matches geomcalc._side)
    def side(p1, p2, q):
        # floats BEFORE arithmetic: python casts to float degrees and
        # int32 differences would overflow DuckDB's strict integers
        return (f"sign(({q}.lon::double - {p1}.lon::double) * "
                f"({p2}.lat::double - {p1}.lat::double) - "
                f"({p2}.lon::double - {p1}.lon::double) * "
                f"({q}.lat::double - {p1}.lat::double))")
    seg_int = (
        f"({side('ll[i]', 'll[i+1]', 'll[j]')} != "
        f" {side('ll[i]', 'll[i+1]', 'll[j+1]')} AND "
        f" {side('ll[j]', 'll[j+1]', 'll[i]')} != "
        f" {side('ll[j]', 'll[j+1]', 'll[i+1]')})")
    self_int = (
        "len(list_filter(flatten(list_transform("
        "generate_series(1, len(ll) - 1), i -> "
        "list_transform(generate_series(i + 2, len(ll) - 1), j -> "
        f"CASE WHEN i = 1 AND j = len(ll) - 1 THEN false "
        f"ELSE {seg_int} END))), x -> x)) > 0")
    is_valid = (f"(len(ll) >= 4 AND {closed} AND NOT ({dupes}) "
                f"AND ({shoelace}) != 0.0 AND NOT ({self_int}))")
    # --- point_on_surface (float degrees over raw ints as double) ---
    cy = ("((list_min(list_transform(ll, p -> p.lat))::double + "
          "list_max(list_transform(ll, p -> p.lat))::double) / 2.0)")
    cross_x = ("list_sort(list_filter(list_transform("
               "generate_series(1, len(ll) - 1), i -> "
               "CASE WHEN (ll[i].lat::double > cy) != (ll[i+1].lat::double > cy) "
               "THEN ll[i].lon::double + (cy - ll[i].lat::double) / "
               "(ll[i+1].lat::double - ll[i].lat::double) * "
               "(ll[i+1].lon::double - ll[i].lon::double) ELSE NULL END), "
               "x -> x IS NOT NULL))")
    widths = ("list_transform(generate_series(1, len(xs) // 2), "
              "i -> xs[2*i] - xs[2*i - 1])")
    return f"""WITH {base_ctes(docs_path)}, {_way_pts(style)},
polys AS (
  SELECT wstat.way FROM wstat
  WHERE wstat.way IN (SELECT way FROM wok)
    AND {feature_exists(style, 'way', 'wstat.way')}
    AND wstat.f = wstat.l AND {is_poly}
),
rings AS (SELECT wp.way,
                 list(struct_pack(lon := wp.lon, lat := wp.lat,
                                  x := {mx}, y := {my}) ORDER BY wp.pos) AS ll
          FROM wp JOIN polys ON wp.way = polys.way GROUP BY wp.way),
v AS (SELECT way, ll, {is_valid} AS is_valid, {cy} AS cy FROM rings),
c AS (SELECT way, ll, is_valid, cy, {cross_x} AS xs FROM v),
w AS (SELECT way, is_valid, cy, xs, {widths} AS ws FROM c),
best AS (SELECT way, is_valid, cy, xs,
                CASE WHEN len(ws) = 0 THEN NULL
                     ELSE list_position(ws, list_max(ws)) END AS bi
         FROM w)
SELECT way AS id, is_valid,
       cast({_banker('(xs[2*bi - 1] + xs[2*bi]) / 2.0')} as int) AS pos_lon,
       cast({_banker('cy')} as int) AS pos_lat
FROM best WHERE bi IS NOT NULL
UNION ALL
-- degenerate scanline (no crossings): python falls back to the mean
SELECT way AS id, is_valid, NULL AS pos_lon,
       cast({_banker('cy')} as int) AS pos_lat
FROM best WHERE bi IS NULL"""


def q_lsh_ann(k: int = 10, n_queries: int = 5, n_planes: int = 3,
              n_tables: int = 8, dim: int = 64, seed: int = 42,
              max_bucket: int = 4096) -> str:
    """Mirror of similarity.lsh_ann_topk with the SAME seeded
    hyperplanes spliced in as literals and the SAME left-to-right
    float summation order (sign of a projection near zero must not
    flip between engines)."""
    from .similarity import _hyperplanes

    def chain(terms) -> str:
        return " + ".join(terms)

    def proj(vec: str, plane) -> str:
        return chain(f"({vec}[{j + 1}]::DOUBLE * {float(c)!r})"
                     for j, c in enumerate(plane))

    def bucket(vec: str, planes) -> str:
        bits = [f"(CASE WHEN ({proj(vec, p)}) > 0 THEN {1 << i} ELSE 0 END)"
                for i, p in enumerate(planes)]
        return "(" + chain(bits) + ")::bigint"

    e_parts, q_parts = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        e_parts.append(f"SELECT vec_id, {t} AS tab, "
                       f"{bucket('embedding', planes)} AS bucket FROM embeddings")
        q_parts.append(f"SELECT query_id, {t} AS tab, "
                       f"{bucket('qe', planes)} AS bucket FROM q")
    dot = chain(f"(q.qe[{j + 1}]::DOUBLE * e.embedding[{j + 1}]::DOUBLE)"
                for j in range(dim))
    nq = chain(f"(q.qe[{j + 1}]::DOUBLE * q.qe[{j + 1}]::DOUBLE)"
               for j in range(dim))
    ne = chain(f"(e.embedding[{j + 1}]::DOUBLE * e.embedding[{j + 1}]::DOUBLE)"
               for j in range(dim))
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT {n_queries}),
eb0 AS ({' UNION ALL '.join(e_parts)}),
ebs AS (SELECT tab, bucket FROM eb0 GROUP BY tab, bucket
        HAVING count(*) <= {max_bucket}),
eb AS (SELECT eb0.* FROM eb0 JOIN ebs ON ebs.tab = eb0.tab
                                     AND ebs.bucket = eb0.bucket),
qb AS ({' UNION ALL '.join(q_parts)}),
cand AS (SELECT DISTINCT qb.query_id, eb.vec_id
         FROM qb JOIN eb ON qb.tab = eb.tab AND qb.bucket = eb.bucket
         WHERE eb.vec_id <> qb.query_id),
scored AS (SELECT c.query_id, c.vec_id,
                  round(({dot}) / (sqrt({nq}) * sqrt({ne})), 6) AS cosine
           FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
           JOIN q ON q.query_id = c.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id) AS rn FROM scored)
SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= {k}"""


def q_ivf_ann(k: int = 10, n_queries: int = 5, n_lists: int = 16,
              n_probe: int = 4, dim: int = 64) -> str:
    """Mirror of similarity.ivf_topk with the SAME deterministic seed
    quantizer (n_lists smallest-vec_id embeddings as centroids) and
    the SAME left-to-right float chains: L2 argmin assignment ties
    broken by list_id, probe = n_probe nearest lists, exact cosine
    re-rank inside probed lists."""

    def chain(terms) -> str:
        return " + ".join(terms)

    def l2(vec: str, cen: str) -> str:
        return chain(
            f"(({vec}[{j + 1}]::DOUBLE - {cen}[{j + 1}]::DOUBLE) * "
            f"({vec}[{j + 1}]::DOUBLE - {cen}[{j + 1}]::DOUBLE))"
            for j in range(dim))

    dot = chain(f"(p.qe[{j + 1}]::DOUBLE * a.embedding[{j + 1}]::DOUBLE)"
                for j in range(dim))
    nq = chain(f"(p.qe[{j + 1}]::DOUBLE * p.qe[{j + 1}]::DOUBLE)"
               for j in range(dim))
    ne = chain(f"(a.embedding[{j + 1}]::DOUBLE * a.embedding[{j + 1}]::DOUBLE)"
               for j in range(dim))
    cos = f"round(({dot}) / (sqrt({nq}) * sqrt({ne})), 6)"
    return f"""
WITH cent AS (SELECT vec_id AS list_id, embedding AS centroid
              FROM (SELECT * FROM embeddings ORDER BY vec_id
                    LIMIT {n_lists})),
assign AS (SELECT vec_id, list_id, embedding FROM (
             SELECT e.vec_id, c.list_id, e.embedding,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY {l2('e.embedding', 'c.centroid')}, c.list_id
                    ) AS pr
             FROM embeddings e CROSS JOIN cent c) WHERE pr = 1),
q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      ORDER BY vec_id LIMIT {n_queries}),
probe AS (SELECT query_id, list_id, qe FROM (
            SELECT q.query_id, c.list_id, q.qe,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY {l2('q.qe', 'c.centroid')}, c.list_id) AS pr
            FROM q CROSS JOIN cent c) WHERE pr <= {n_probe}),
scored AS (SELECT p.query_id, a.vec_id, {cos} AS cosine
           FROM assign a JOIN probe p USING (list_id)
           WHERE a.vec_id <> p.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id) AS rn FROM scored)
SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= {k}"""


# ---------------------------------------------------------------------------
# training-data op oracles (pre-registered views: documents, embeddings,
# events) — duckdb list-lambda re-derivations of dedup.py / textops.py
# ---------------------------------------------------------------------------

_TOKS_DD = "regexp_split_to_array(trim(text), '\\s+')"


def _shingles_dd(n: int) -> str:
    t = _TOKS_DD
    return (f"(CASE WHEN len({t}) < {n} THEN [array_to_string({t}, ' ')] "
            f"ELSE list_transform(generate_series(1, len({t}) - {n - 1}), "
            f"i -> array_to_string(({t})[i:i+{n - 1}], ' ')) END)")


def q_minhash_signatures(n_hashes: int = 8, shingle: int = 3) -> str:
    sh = _shingles_dd(shingle)
    comps = ", ".join(
        f"list_min(list_transform({sh}, s -> md5(s || '#' || {i})))"
        for i in range(n_hashes))
    return (f"SELECT doc_id, array_to_string([{comps}], '|') AS sig "
            f"FROM documents")


def q_simhash(bits: int = 60, shingle: int = 2,
              from_table: str = "documents") -> str:
    sh = _shingles_dd(shingle)
    hex_chars = (bits + 3) // 4
    hv = f"('0x' || substring(md5(s), 1, {hex_chars}))::bigint"
    bit_sums = ", ".join(
        f"list_sum(list_transform({sh}, s -> CASE WHEN ({hv} // {1 << j}) % 2 = 1 "
        f"THEN 1 ELSE -1 END))" for j in range(bits))
    combine = " + ".join(
        f"(CASE WHEN bs[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)::bigint"
        for j in range(bits))
    return (f"SELECT doc_id, ({combine}) AS simhash FROM "
            f"(SELECT doc_id, [{bit_sums}] AS bs FROM {from_table})")


_KEEPERS = ("(SELECT min(doc_id) AS doc_id, text FROM documents "
            "GROUP BY text)")


def q_minhash_lsh_pairs(n_hashes: int = 8, bands: int = 4,
                        shingle: int = 3, max_bucket: int = 64) -> str:
    """Mirror of dedup.minhash_lsh_pairs: distinct-text keepers,
    band-bucket equi-join, bucket-size cap."""
    sh = _shingles_dd(shingle)
    rpb = n_hashes // bands
    comps = ", ".join(
        f"list_min(list_transform({sh}, s -> md5(s || '#' || {i})))"
        for i in range(n_hashes))
    return f"""
WITH uniq AS {_KEEPERS},
sig AS (SELECT doc_id, [{comps}] AS sig FROM uniq),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(sig[b * {rpb} + 1 : (b + 1) * {rpb}], '|')) AS bucket
  FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS b)),
sized AS (SELECT band, bucket FROM banded GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND {max_bucket}),
kept AS (SELECT banded.* FROM banded JOIN sized USING (band, bucket))
SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_bands
FROM kept a JOIN kept b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id"""


def q_simhash_pairs(max_hamming: int = 3, bits: int = 60,
                    shingle: int = 2) -> str:
    """Mirror of dedup.simhash_near_pairs: distinct-text keepers,
    hamming-chunk equi-join, exact bit_count filter."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    sh_sql = q_simhash(bits, shingle, from_table="uniq")
    return f"""
WITH uniq AS {_KEEPERS},
sh AS ({sh_sql}),
chunks AS (
  SELECT doc_id, simhash, c AS chunk_idx,
         (simhash // power(2, c * {chunk_bits})::bigint) % {1 << chunk_bits} AS chunk
  FROM sh, (SELECT unnest(generate_series(0, {n_chunks - 1})) AS c)),
cand AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
         a.simhash AS ha, b.simhash AS hb
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
  WHERE a.doc_id < b.doc_id)
SELECT a, b, bit_count(xor(ha, hb))::bigint AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""


def q_jaccard_lsh(threshold: float = 0.8, shingle: int = 3,
                  n_hashes: int = 16, bands: int = 4,
                  max_bucket: int = 64) -> str:
    """Mirror of dedup.jaccard_lsh_pairs: MinHash-LSH candidates
    (distinct-text keepers, band buckets, size cap) verified by exact
    shingle Jaccard."""
    sh = _shingles_dd(shingle)
    rpb = n_hashes // bands
    comps = ", ".join(
        f"list_min(list_transform({sh}, s -> md5(s || '#' || {i})))"
        for i in range(n_hashes))
    jac = ("len(list_filter(sa.sh, x -> list_contains(sb.sh, x)))::double / "
           "len(list_distinct(list_concat(sa.sh, sb.sh)))")
    return f"""
WITH uniq AS {_KEEPERS},
sig AS (SELECT doc_id, [{comps}] AS sig FROM uniq),
banded AS (
  SELECT doc_id, b AS band,
         md5(array_to_string(sig[b * {rpb} + 1 : (b + 1) * {rpb}], '|')) AS bucket
  FROM sig, (SELECT unnest(generate_series(0, {bands - 1})) AS b)),
sized AS (SELECT band, bucket FROM banded GROUP BY band, bucket
          HAVING count(*) BETWEEN 2 AND {max_bucket}),
kept AS (SELECT banded.* FROM banded JOIN sized USING (band, bucket)),
cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         FROM kept a JOIN kept b
           ON a.band = b.band AND a.bucket = b.bucket
         WHERE a.doc_id < b.doc_id),
shg AS (SELECT doc_id, list_distinct({sh}) AS sh FROM uniq)
SELECT c.a, c.b, round({jac}, 6) AS jaccard
FROM cand c JOIN shg sa ON sa.doc_id = c.a JOIN shg sb ON sb.doc_id = c.b
WHERE round({jac}, 6) >= {threshold}"""


def q_ngram_jaccard(threshold: float = 0.8, shingle: int = 3) -> str:
    """Mirror of dedup.ngram_jaccard_pairs (blocked by ``source``)."""
    sh = _shingles_dd(shingle)
    return f"""
WITH s AS (SELECT doc_id, source AS blk, list_distinct({sh}) AS sh
           FROM documents)
SELECT a.doc_id AS a, b.doc_id AS b,
       round(len(list_filter(a.sh, x -> list_contains(b.sh, x)))::double /
             len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE round(len(list_filter(a.sh, x -> list_contains(b.sh, x)))::double /
            len(list_distinct(list_concat(a.sh, b.sh))), 6) >= {threshold}"""


def q_quality_score(stopwords_en: list[str]) -> str:
    """Mirror of textops.quality_score (raw ratios inside the combined
    score, rounding only on output columns)."""
    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    lst = ", ".join(f"'{w}'" for w in stopwords_en)
    n = f"len({toks})"
    punct = (r"length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) / "
             "greatest(length(text), 1)::double")
    mean_tok = f"length(trim(text)) / greatest({n}, 1)::double"
    stop_en = (f"len(list_filter({toks}, t -> t IN ({lst}))) / "
               f"greatest({n}, 1)::double")
    return f"""
SELECT doc_id,
       {n}::bigint AS n_tokens,
       round({mean_tok}, 6) AS mean_token_len,
       round({punct}, 6) AS punct_ratio,
       round({stop_en}, 6) AS stop_ratio_en,
       round(least(1.0, {n} / 100.0) * (1.0 - least(1.0, ({punct}) * 4)) *
             least(1.0, 0.2 + ({stop_en}) * 4), 6) AS quality
FROM documents"""


def q_language_id(stopwords: dict[str, list[str]]) -> str:
    t = _TOKS_DD
    ratios = []
    for lg, words in stopwords.items():
        lst = ", ".join(f"'{w}'" for w in words)
        ratios.append(
            f"len(list_filter(list_transform({t}, x -> lower(x)), "
            f"t -> t IN ({lst}))) / greatest(len({t}), 1)::double AS r_{lg}")
    langs = list(stopwords)
    structs = ", ".join(f"{{'score': r_{lg}, 'lang': '{lg}'}}" for lg in langs)
    return f"""
WITH sc AS (SELECT doc_id, {', '.join(ratios)} FROM documents),
best AS (SELECT doc_id, list_sort([{structs}],
         'DESC')[1] AS b FROM sc)
SELECT doc_id,
       CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
       round(b.score, 6) AS lang_score
FROM best"""


def q_token_counts() -> str:
    return f"""
SELECT doc_id,
       len({_TOKS_DD})::bigint AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::bigint
         AS bpe_ish_tokens,
       length(text)::bigint AS n_chars
FROM documents"""


def q_fingerprint(window: int = 8) -> str:
    t = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    mins = (f"list_transform(generate_series(1, greatest(len({t}) - {window - 1}, 1)), "
            f"i -> list_min(list_transform(({t})[i:i+{window - 1}], x -> md5(x))))")
    return (f"SELECT doc_id, md5(array_to_string(list_sort(list_distinct({mins})), '|')) "
            f"AS fp FROM documents")


def q_corpus_prep(stopwords: dict, min_quality: float = 0.05) -> str:
    """Mirror of textops.corpus_prep: exact-dedup keepers -> quality
    gate -> language-ID -> per-language integer token stats (quality
    summed in micro-units so no cross-row float sum exists)."""
    toks = r"regexp_split_to_array(lower(trim(text)), '\s+')"
    n = f"len({toks})"
    punct = (r"length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g')) / "
             "greatest(length(text), 1)::double")
    en = ", ".join(f"'{w}'" for w in stopwords["en"])
    stop_en = (f"len(list_filter({toks}, t -> t IN ({en}))) / "
               f"greatest({n}, 1)::double")
    quality = (f"round(least(1.0, {n} / 100.0) * "
               f"(1.0 - least(1.0, ({punct}) * 4)) * "
               f"least(1.0, 0.2 + ({stop_en}) * 4), 6)")
    ratios = []
    for lg, words in stopwords.items():
        lst = ", ".join(f"'{w}'" for w in words)
        ratios.append(f"len(list_filter({toks}, t -> t IN ({lst}))) / "
                      f"greatest({n}, 1)::double AS r_{lg}")
    structs = ", ".join(f"{{'score': r_{lg}, 'lang': '{lg}'}}"
                        for lg in stopwords)
    bpe = r"len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"
    return f"""
WITH keep AS {_KEEPERS},
sc AS (SELECT doc_id, text, {', '.join(ratios)}, {quality} AS quality
       FROM keep),
feats AS (SELECT doc_id, quality,
                 list_sort([{structs}], 'DESC')[1] AS b,
                 len({toks})::bigint AS ws_tokens,
                 {bpe}::bigint AS bpe_ish_tokens,
                 length(text)::bigint AS n_chars
          FROM sc)
SELECT CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang_pred,
       count(*)::bigint AS n_docs,
       sum(ws_tokens)::bigint AS ws_tokens,
       sum(bpe_ish_tokens)::bigint AS bpe_ish_tokens,
       sum(n_chars)::bigint AS n_chars,
       sum(CAST(round(quality * 1000000) AS BIGINT))::bigint
         AS sum_quality_micro
FROM feats WHERE quality >= {min_quality}
GROUP BY 1"""


def q_embedding_topk(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id) AS rn FROM scored)
SELECT query_id, vec_id, cosine FROM ranked WHERE rn <= {k}"""


def q_embedding_near_dup(threshold: float = 0.95, dim: int = 64) -> str:
    """Mirror of dedup.embedding_near_dup_pairs (label-blocked exact
    cosine): explicit left-assoc sum chains reproduce Spark's
    aggregate-fold float order."""
    def chain(f):
        return " + ".join(f(j) for j in range(dim))
    dot = chain(lambda j: f"(a.embedding[{j + 1}]::DOUBLE * b.embedding[{j + 1}]::DOUBLE)")
    na = chain(lambda j: f"(a.embedding[{j + 1}]::DOUBLE * a.embedding[{j + 1}]::DOUBLE)")
    nb = chain(lambda j: f"(b.embedding[{j + 1}]::DOUBLE * b.embedding[{j + 1}]::DOUBLE)")
    cos = f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"
    return f"""
SELECT a.vec_id AS a, b.vec_id AS b, {cos} AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}"""


def q_embedding_lsh_near_dup(threshold: float = 0.35, n_planes: int = 4,
                             n_tables: int = 4, dim: int = 64,
                             seed: int = 42, max_bucket: int = 1024) -> str:
    """Mirror of dedup.embedding_lsh_near_dup: the SAME seeded
    hyperplanes spliced in as literals (left-to-right projection sum,
    sign near zero must not flip), candidates = distinct bucket-
    sharing pairs over all tables, exact cosine verification.

    ``max_bucket`` mirrors the engine's (tab, bucket) size cap
    (dedup.py embedding_lsh_near_dup): buckets with fewer than 2 or
    more than ``max_bucket`` members contribute no candidate pairs."""
    from .similarity import _hyperplanes

    def chain(terms) -> str:
        return " + ".join(terms)

    def bucket(vec: str, planes) -> str:
        bits = []
        for i, p in enumerate(planes):
            proj = chain(f"({vec}[{j + 1}]::DOUBLE * {float(c)!r})"
                         for j, c in enumerate(p))
            bits.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << i} ELSE 0 END)")
        return "(" + chain(bits) + ")::bigint"

    e_parts = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        e_parts.append(f"SELECT vec_id, {t} AS tab, "
                       f"{bucket('embedding', planes)} AS bucket "
                       f"FROM embeddings")
    union = " UNION ALL ".join(e_parts)
    dot = chain(f"(ea.embedding[{j + 1}]::DOUBLE * eb.embedding[{j + 1}]::DOUBLE)"
                for j in range(dim))
    na = chain(f"(ea.embedding[{j + 1}]::DOUBLE * ea.embedding[{j + 1}]::DOUBLE)"
               for j in range(dim))
    nb = chain(f"(eb.embedding[{j + 1}]::DOUBLE * eb.embedding[{j + 1}]::DOUBLE)"
               for j in range(dim))
    cos = f"round(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"
    return f"""
WITH tabs AS ({union}),
keep AS (SELECT tab, bucket FROM tabs GROUP BY tab, bucket
         HAVING count(*) BETWEEN 2 AND {max_bucket}),
kept AS (SELECT t.* FROM tabs t JOIN keep k
           ON t.tab = k.tab AND t.bucket = k.bucket),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         FROM kept x JOIN kept y
           ON x.tab = y.tab AND x.bucket = y.bucket
         WHERE x.vec_id < y.vec_id)
SELECT c.a, c.b, {cos} AS cosine
FROM cand c JOIN embeddings ea ON ea.vec_id = c.a
            JOIN embeddings eb ON eb.vec_id = c.b
WHERE {cos} >= {threshold}"""


def q_multimodal_features(docs_path: str, dim: int = 8) -> str:
    """Mirror of multimodal.extract_features over synth_media_table:
    payload = unhex(md5(tile)) (so lower-hex(payload) == md5(tile)),
    n_bytes = 16, and feature j = int(md5(md5(tile) || '#' || j)[:6],
    16) / 2^24 — 24-bit dyadics survive the float32 cast exactly, so
    the rounded feature sum matches bit-for-bit."""
    digits = "0123456789abcdef"

    def hex6_int(h: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, 6), k -> "
                f"(strpos('{digits}', substr({h}, k, 1)) - 1) "
                f"* power(16, 6 - k)))")

    comp = " + ".join(
        hex6_int(f"md5(m.tile || '#' || {j})") for j in range(dim))
    return f"""
WITH sp AS (SELECT doc_id, unnest(spans) AS s
            FROM read_parquet({_lit(docs_path)})),
md AS (SELECT doc_id, regexp_extract(s.text, 'tile=(.*)$', 1) AS ref
       FROM sp WHERE s.kind = 'media'),
m AS (SELECT doc_id, ref, md5(ref) AS tile FROM md)
SELECT doc_id, ref AS media_ref, CAST(16 AS BIGINT) AS n_bytes,
       round(({comp}) / 16777216.0, 4) AS feat_sum
FROM m"""


def q_events_rollup() -> str:
    return """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2"""


def q_sessionize(gap_minutes: int = 30) -> str:
    # both windows order by (ts, event_id) — with tied timestamps the
    # cumulative session id depends on the tie-break, so the sess CTE
    # must use the same ordering as gaps (round-1 red row)
    return f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {gap_minutes} MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (SELECT user_id, ts,
                -- cast: DuckDB sum() yields HUGEINT which pandas turns
                -- into float64 ('1.0' vs Spark's '1' in the value hash)
                cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
         FROM gaps)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id"""
