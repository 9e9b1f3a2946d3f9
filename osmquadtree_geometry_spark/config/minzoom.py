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

The default rules below are our own-authored table covering every
(type, key) family the reference's embedded table has
(`default_minzoom_values.rs`, 599 rows / 58 families): value-level
rows for the high-traffic keys (place/highway/railway/waterway/
natural/landuse/amenity/...), wildcard rows for the tails.  Zoom
values follow standard carto ladders, not copied row-for-row.
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
0,place,hamlet,13,point
0,place,suburb,13,point
0,place,locality,14,point
0,place,island,10,point
0,place,islet,14,point
0,place,*,14,point
0,amenity,hospital,13,point
0,amenity,school,14,point
0,amenity,university,13,point
0,amenity,place_of_worship,15,point
0,amenity,parking,15,point
0,amenity,fuel,15,point
0,amenity,pub,16,point
0,amenity,cafe,16,point
0,amenity,restaurant,16,point
0,amenity,bank,16,point
0,amenity,pharmacy,16,point
0,amenity,bench,18,point
0,amenity,*,15,point
0,shop,supermarket,15,point
0,shop,mall,14,point
0,shop,*,16,point
0,highway,motorway_junction,11,point
0,highway,bus_stop,16,point
0,highway,traffic_signals,17,point
0,highway,crossing,17,point
0,highway,turning_circle,17,point
0,highway,*,17,point
0,railway,station,12,point
0,railway,halt,14,point
0,railway,tram_stop,15,point
0,railway,subway_entrance,16,point
0,railway,level_crossing,16,point
0,railway,*,15,point
0,tourism,hotel,15,point
0,tourism,museum,14,point
0,tourism,viewpoint,14,point
0,tourism,attraction,14,point
0,tourism,*,15,point
0,barrier,gate,16,point
0,barrier,bollard,17,point
0,barrier,lift_gate,16,point
0,barrier,*,17,point
0,addr:housenumber,*,18,point
0,addr:housename,*,18,point
0,natural,peak,11,point
0,natural,volcano,11,point
0,natural,spring,14,point
0,natural,cave_entrance,15,point
0,natural,tree,18,point
0,natural,*,15,point
0,aerialway,station,13,point
0,aeroway,aerodrome,10,point
0,aeroway,helipad,16,point
0,aeroway,gate,17,point
0,aeroway,*,14,point
0,boundary,*,13,point
0,historic,castle,13,point
0,historic,monument,14,point
0,historic,memorial,16,point
0,historic,ruins,15,point
0,historic,*,15,point
0,junction,*,16,point
0,landuse,*,14,point
0,leisure,park,14,point
0,leisure,playground,16,point
0,leisure,pitch,16,point
0,leisure,*,15,point
0,man_made,tower,14,point
0,man_made,lighthouse,13,point
0,man_made,mast,15,point
0,man_made,water_tower,15,point
0,man_made,*,16,point
0,military,*,12,point
0,power,plant,13,point
0,power,substation,14,point
0,power,tower,15,point
0,power,generator,15,point
0,power,pole,17,point
0,power,*,15,point
0,waterway,waterfall,13,point
0,waterway,lock_gate,15,point
0,waterway,*,15,point
1,highway,motorway,5,line
1,highway,motorway_link,10,line
1,highway,trunk,6,line
1,highway,trunk_link,10,line
1,highway,primary,8,line
1,highway,primary_link,11,line
1,highway,secondary,9,line
1,highway,secondary_link,11,line
1,highway,tertiary,10,line
1,highway,tertiary_link,12,line
1,highway,residential,12,line
1,highway,unclassified,12,line
1,highway,living_street,13,line
1,highway,pedestrian,13,line
1,highway,service,14,line
1,highway,track,13,line
1,highway,path,14,line
1,highway,footway,14,line
1,highway,cycleway,13,line
1,highway,bridleway,14,line
1,highway,steps,15,line
1,highway,construction,12,line
1,highway,raceway,12,line
1,highway,road,13,line
1,highway,*,13,line
1,railway,rail,8,line
1,railway,light_rail,11,line
1,railway,subway,12,line
1,railway,tram,12,line
1,railway,narrow_gauge,11,line
1,railway,funicular,12,line
1,railway,monorail,12,line
1,railway,preserved,12,line
1,railway,disused,13,line
1,railway,construction,12,line
1,railway,platform,15,line
1,railway,*,10,line
1,waterway,river,8,line
1,waterway,canal,9,line
1,waterway,stream,12,line
1,waterway,drain,14,line
1,waterway,ditch,14,line
1,waterway,weir,13,line
1,waterway,dam,11,line
1,waterway,dock,13,line
1,waterway,riverbank,9,line
1,waterway,*,12,line
1,aeroway,runway,10,line
1,aeroway,taxiway,11,line
1,aeroway,*,11,line
1,aerialway,cable_car,11,line
1,aerialway,gondola,11,line
1,aerialway,chair_lift,12,line
1,aerialway,drag_lift,13,line
1,aerialway,*,12,line
1,barrier,city_wall,14,line
1,barrier,hedge,16,line
1,barrier,fence,16,line
1,barrier,wall,16,line
1,barrier,retaining_wall,16,line
1,barrier,guard_rail,16,line
1,barrier,ditch,15,line
1,barrier,*,16,line
1,man_made,pier,13,line
1,man_made,breakwater,12,line
1,man_made,groyne,14,line
1,man_made,embankment,13,line
1,man_made,*,13,line
1,power,line,13,line
1,power,minor_line,15,line
1,power,*,15,line
1,natural,cliff,13,line
1,natural,tree_row,15,line
1,natural,*,13,line
1,historic,citywalls,14,line
1,historic,*,15,line
1,addr:interpolation,*,17,line
1,route,ferry,7,line
1,boundary,administrative,4,line
2,natural,water,5,polygon
2,natural,wood,7,polygon
2,natural,glacier,6,polygon
2,natural,wetland,8,polygon
2,natural,scrub,10,polygon
2,natural,heath,10,polygon
2,natural,grassland,10,polygon
2,natural,sand,10,polygon
2,natural,beach,10,polygon
2,natural,bare_rock,10,polygon
2,natural,scree,10,polygon
2,natural,mud,10,polygon
2,natural,bay,8,polygon
2,natural,*,10,polygon
2,landuse,forest,7,polygon
2,landuse,residential,10,polygon
2,landuse,farmland,8,polygon
2,landuse,meadow,10,polygon
2,landuse,grass,11,polygon
2,landuse,industrial,11,polygon
2,landuse,commercial,12,polygon
2,landuse,retail,12,polygon
2,landuse,reservoir,5,polygon
2,landuse,basin,8,polygon
2,landuse,quarry,11,polygon
2,landuse,cemetery,12,polygon
2,landuse,allotments,12,polygon
2,landuse,vineyard,11,polygon
2,landuse,orchard,11,polygon
2,landuse,village_green,12,polygon
2,landuse,recreation_ground,12,polygon
2,landuse,landfill,12,polygon
2,landuse,railway,12,polygon
2,landuse,military,9,polygon
2,landuse,*,10,polygon
2,water,*,5,polygon
2,waterway,riverbank,8,polygon
2,waterway,dock,12,polygon
2,waterway,*,8,polygon
2,wetland,marsh,10,polygon
2,wetland,swamp,10,polygon
2,wetland,bog,10,polygon
2,wetland,reedbed,11,polygon
2,wetland,saltmarsh,10,polygon
2,wetland,mangrove,10,polygon
2,wetland,tidalflat,10,polygon
2,wetland,*,10,polygon
2,leisure,park,10,polygon
2,leisure,nature_reserve,8,polygon
2,leisure,golf_course,11,polygon
2,leisure,pitch,14,polygon
2,leisure,playground,15,polygon
2,leisure,garden,13,polygon
2,leisure,stadium,12,polygon
2,leisure,sports_centre,12,polygon
2,leisure,swimming_pool,15,polygon
2,leisure,common,12,polygon
2,leisure,marina,13,polygon
2,leisure,*,12,polygon
2,building,*,14,polygon
2,amenity,school,14,polygon
2,amenity,university,12,polygon
2,amenity,hospital,12,polygon
2,amenity,college,13,polygon
2,amenity,parking,14,polygon
2,amenity,*,13,polygon
2,boundary,administrative,4,polygon
2,boundary,national_park,6,polygon
2,boundary,protected_area,7,polygon
2,boundary,*,8,polygon
2,admin_level,2,2,polygon
2,admin_level,3,4,polygon
2,admin_level,4,4,polygon
2,admin_level,5,6,polygon
2,admin_level,6,7,polygon
2,admin_level,7,8,polygon
2,admin_level,8,9,polygon
2,admin_level,9,10,polygon
2,admin_level,10,11,polygon
2,admin_level,*,9,polygon
2,aeroway,aerodrome,10,polygon
2,aeroway,apron,13,polygon
2,aeroway,runway,11,polygon
2,aeroway,taxiway,12,polygon
2,aeroway,helipad,16,polygon
2,aeroway,terminal,13,polygon
2,aeroway,*,11,polygon
2,military,danger_area,9,polygon
2,military,barracks,12,polygon
2,military,*,9,polygon
2,place,island,8,polygon
2,place,islet,13,polygon
2,place,*,10,polygon
2,power,plant,12,polygon
2,power,substation,13,polygon
2,power,generator,14,polygon
2,power,station,13,polygon
2,power,*,13,polygon
2,railway,station,13,polygon
2,railway,platform,15,polygon
2,railway,*,13,polygon
2,shop,mall,13,polygon
2,shop,supermarket,14,polygon
2,shop,*,15,polygon
2,tourism,zoo,12,polygon
2,tourism,theme_park,12,polygon
2,tourism,camp_site,13,polygon
2,tourism,attraction,13,polygon
2,tourism,museum,14,polygon
2,tourism,*,14,polygon
2,highway,pedestrian,13,polygon
2,highway,services,12,polygon
2,highway,rest_area,13,polygon
2,highway,platform,15,polygon
2,highway,*,14,polygon
2,historic,castle,13,polygon
2,historic,archaeological_site,14,polygon
2,historic,fort,13,polygon
2,historic,*,14,polygon
2,man_made,pier,13,polygon
2,man_made,bridge,14,polygon
2,man_made,works,13,polygon
2,man_made,wastewater_plant,12,polygon
2,man_made,water_works,12,polygon
2,man_made,*,13,polygon
2,barrier,*,16,polygon
2,addr:housenumber,*,18,polygon
2,addr:housename,*,18,polygon
2,aerialway,station,13,polygon
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
