from . import geomcalc, mercator, quadtree, rings, wkb  # noqa: F401
