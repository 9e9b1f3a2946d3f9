"""Little-endian WKB writers (type codes 1/2/3/6, optional SRID flag).

Byte layout transcribed from `/root/reference/src/wkb.rs:49-79` and the
per-type ``to_wkb`` impls (`pointgeometry.rs:80-87`,
`linestringgeometry.rs:67-75`, `simplepolygongeometry.rs:104-113`,
`complicatedpolygongeometry.rs:419-436, 513-536`):

  * byte order marker 0x01 (little endian)
  * type uint32; with SRID the flag is ``type + (32 << 24)`` (i.e.
    0x20000000) followed by uint32 srid (3857 if transformed else 4326)
  * coordinates are float64 pairs — in *2dp-rounded mercator metres*
    when transformed, else raw degrees
  * a 1-part multipolygon collapses to a plain Polygon (type 3,
    `complicatedpolygongeometry.rs:524-526`)
  * simple polygons reverse their coordinate list when ``reversed``
    (stored area was negative): `simplepolygongeometry.rs:104-113`.
"""

from __future__ import annotations

import struct

import numpy as np

from .mercator import coordinate_as_float, forward

_SRID_FLAG = 32 << 24


def _header(ty: int, transform: bool, with_srid: bool) -> bytes:
    if with_srid:
        return (b"\x01" + struct.pack("<I", ty + _SRID_FLAG)
                + struct.pack("<I", 3857 if transform else 4326))
    return b"\x01" + struct.pack("<I", ty)


def _xy(lon: np.ndarray, lat: np.ndarray, transform: bool) -> tuple[np.ndarray, np.ndarray]:
    if transform:
        return forward(lon, lat)
    return coordinate_as_float(lon), coordinate_as_float(lat)


def _coords(lon, lat, transform: bool) -> bytes:
    x, y = _xy(np.asarray(lon), np.asarray(lat), transform)
    out = np.empty(2 * len(x), dtype="<f8")
    out[0::2] = x
    out[1::2] = y
    return out.tobytes()


def point_wkb(lon: int, lat: int, transform: bool = True, with_srid: bool = True) -> bytes:
    return _header(1, transform, with_srid) + _coords([lon], [lat], transform)


def linestring_wkb(lon, lat, transform: bool = True, with_srid: bool = True) -> bytes:
    return (_header(2, transform, with_srid)
            + struct.pack("<I", len(lon)) + _coords(lon, lat, transform))


def polygon_wkb(rings: list[tuple[np.ndarray, np.ndarray]],
                transform: bool = True, with_srid: bool = True) -> bytes:
    """rings[0] is the exterior; coordinate order is the caller's
    responsibility (winding repair happens upstream)."""
    out = [_header(3, transform, with_srid), struct.pack("<I", len(rings))]
    for lon, lat in rings:
        out.append(struct.pack("<I", len(lon)))
        out.append(_coords(lon, lat, transform))
    return b"".join(out)


def simple_polygon_wkb(lon, lat, reversed_: bool,
                       transform: bool = True, with_srid: bool = True) -> bytes:
    lon = np.asarray(lon)
    lat = np.asarray(lat)
    if reversed_:
        lon, lat = lon[::-1], lat[::-1]
    return polygon_wkb([(lon, lat)], transform, with_srid)


def multipolygon_wkb(parts: list[list[tuple[np.ndarray, np.ndarray]]],
                     transform: bool = True, with_srid: bool = True) -> bytes:
    """parts: one list of rings (exterior first) per polygon part.
    Single part -> plain Polygon; the inner polygon headers keep their
    own SRID block exactly as the reference concatenates them."""
    if len(parts) == 1:
        return polygon_wkb(parts[0], transform, with_srid)
    out = [_header(6, transform, with_srid), struct.pack("<I", len(parts))]
    for rings in parts:
        out.append(polygon_wkb(rings, transform, with_srid))
    return b"".join(out)
