"""MinZoom specification — tag->zoom lookup with area flooring.

Semantics transcribed from `/root/reference/src/minzoom.rs`:
  * CSV format: 5 columns ``type(0=point,1=line,2=polygon), key, val,
    zoom, table`` (`minzoom.rs:87-135`).
  * lookup: exact ``(key, val)`` match else ``(key, '*')`` wildcard
    (`:24-32`); feature minzoom = MIN over all matching tags (`:34-50`).
  * polygons additionally floor by
    ``area_minzoom(area, min_area) = min(18, floor(res_zoom(sqrt(area/min_area))))``
    with ``res_zoom(res) = log2(EARTH_WIDTH*2/res/256)`` and
    ``|res| < 0.001 -> 20`` (`:52-66`), combined as
    ``max(tag_zoom, area_minzoom)`` (`:165-170`).
  * if ``max_minzoom`` is set, features with no zoom or zoom >
    max_minzoom are DROPPED; if unset, unmatched features pass through
    without a minzoom (`:141-155, 172-238`).
  * matched features get ``quadtree = quadtree.round(minzoom)`` (`:184`).

The default rules below are our own compact table (the reference
embeds 526 rules; ours cover the same key families).
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass, field

from ..kernels.quadtree import EARTH_WIDTH

MAX_MINZOOM = 18

DEFAULT_MINZOOM_CSV = """type,key,val,zoom,table
0,place,city,6,point
0,place,town,9,point
0,place,village,12,point
0,place,*,14,point
0,amenity,*,15,point
0,shop,*,16,point
0,highway,bus_stop,16,point
0,highway,*,17,point
0,railway,station,12,point
0,railway,*,15,point
0,tourism,*,15,point
0,barrier,*,17,point
0,addr:housenumber,*,18,point
0,natural,peak,11,point
0,natural,*,15,point
1,highway,motorway,5,line
1,highway,trunk,6,line
1,highway,primary,8,line
1,highway,secondary,9,line
1,highway,tertiary,10,line
1,highway,residential,12,line
1,highway,unclassified,12,line
1,highway,service,14,line
1,highway,*,13,line
1,railway,rail,8,line
1,railway,*,10,line
1,waterway,river,8,line
1,waterway,*,12,line
1,aeroway,*,10,line
1,route,ferry,7,line
1,boundary,administrative,4,line
2,natural,*,7,polygon
2,landuse,*,10,polygon
2,water,*,7,polygon
2,waterway,*,8,polygon
2,leisure,*,12,polygon
2,building,*,14,polygon
2,amenity,*,13,polygon
2,boundary,administrative,4,polygon
2,boundary,*,8,polygon
2,aeroway,*,10,polygon
2,military,*,9,polygon
2,place,*,10,polygon
"""


def res_zoom(res: float) -> float:
    import math
    if abs(res) < 0.001:
        return 20.0
    return math.log(EARTH_WIDTH * 2.0 / res / 256.0, 2.0)


def area_minzoom(area: float, min_area: float) -> int:
    import math
    return min(MAX_MINZOOM, int(math.floor(res_zoom(math.sqrt(area / min_area)))))


@dataclass
class MinZoomSpec:
    min_area: float = 5.0
    max_minzoom: int | None = None
    points: dict[tuple[str, str], int] = field(default_factory=dict)
    lines: dict[tuple[str, str], int] = field(default_factory=dict)
    polygons: dict[tuple[str, str], int] = field(default_factory=dict)

    @staticmethod
    def from_csv(text: str, min_area: float = 5.0,
                 max_minzoom: int | None = None) -> "MinZoomSpec":
        spec = MinZoomSpec(min_area=min_area, max_minzoom=max_minzoom)
        for line_no, rec in enumerate(csv.reader(io.StringIO(text))):
            if line_no == 0 and rec and rec[0] == "type":
                continue  # header
            if not rec:
                continue
            if len(rec) != 5:
                raise ValueError(f"minzoom at line {line_no} wrong length")
            typ, key, val, zoom, _table = rec
            target = {"0": spec.points, "1": spec.lines, "2": spec.polygons}.get(typ)
            if target is None:
                raise ValueError(f"wrong type at line {line_no}")
            target[(key, val)] = int(zoom)
        return spec

    @staticmethod
    def default(min_area: float = 5.0, max_minzoom: int | None = None) -> "MinZoomSpec":
        return MinZoomSpec.from_csv(DEFAULT_MINZOOM_CSV, min_area, max_minzoom)

    # -- python-side lookup (used by oracles/tests) ---------------------------

    def _find(self, table: dict, tags: dict) -> int | None:
        ans = None
        for k, v in tags.items():
            m = table.get((k, v))
            if m is None:
                m = table.get((k, "*"))
            if m is not None:
                ans = m if ans is None else min(ans, m)
        return ans

    def _cap(self, v: int | None) -> int | None:
        if self.max_minzoom is None or v is None:
            return v
        return None if v > self.max_minzoom else v

    def find_point(self, tags: dict) -> int | None:
        return self._cap(self._find(self.points, tags))

    def find_line(self, tags: dict) -> int | None:
        return self._cap(self._find(self.lines, tags))

    def find_polygon(self, tags: dict, area: float) -> int | None:
        v = self._find(self.polygons, tags)
        if v is None:
            return None
        return self._cap(max(v, area_minzoom(area, self.min_area)))

    # -- compiled SQL (map-literal lookup; JVM-side, no shuffle) --------------

    @staticmethod
    def _lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def _sql_lookup(self, table: dict, tags: str) -> str:
        exact = {f"{k}\x00{v}": z for (k, v), z in table.items() if v != "*"}
        stars = {k: z for (k, v), z in table.items() if v == "*"}
        e = ", ".join(f"{self._lit(k)}, cast({z} as bigint)" for k, z in exact.items()) or \
            "'\x00', cast(null as bigint)"
        m = f"map({e})"
        if stars:
            s = ", ".join(f"{self._lit(k)}, cast({z} as bigint)" for k, z in stars.items())
            sm = f"map({s})"
            per_tag = f"coalesce({m}[concat(e.key, chr(0), e.value)], {sm}[e.key])"
        else:
            per_tag = f"{m}[concat(e.key, chr(0), e.value)]"
        return (f"array_min(filter(transform(map_entries({tags}), "
                f"e -> {per_tag}), x -> x is not null))")

    def sql_point_minzoom(self, tags: str) -> str:
        return self._sql_cap(self._sql_lookup(self.points, tags))

    def sql_line_minzoom(self, tags: str) -> str:
        return self._sql_cap(self._sql_lookup(self.lines, tags))

    def sql_polygon_minzoom(self, tags: str, area: str) -> str:
        base = self._sql_lookup(self.polygons, tags)
        az = (f"least(cast({MAX_MINZOOM} as bigint), cast(floor(case "
              f"when abs(sqrt(({area}) / {self.min_area})) < 0.001 then 20.0 "
              f"else log2({EARTH_WIDTH!r} * 2.0 / sqrt(({area}) / {self.min_area}) / 256.0) "
              f"end) as bigint))")
        return self._sql_cap(f"(case when ({base}) is null then null "
                             f"else greatest({base}, {az}) end)")

    def _sql_cap(self, expr: str) -> str:
        if self.max_minzoom is None:
            return expr
        return f"(case when ({expr}) > {self.max_minzoom} then null else ({expr}) end)"
