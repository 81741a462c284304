"""Spatial scalar functions.

Reference: ``get_distance`` (gofast/utils/spatial_utils.py:4790),
``get_bearing`` (:4975), ``get_azimuth`` (:5093),
``extract_coordinates`` (:2477).  Pure trigonometric column expressions —
evaluated inline during the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def euclidean_distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Planar distance between two points (get_distance with
    ``is_latlon=False``)."""
    return F.sqrt(F.pow(x2 - x1, 2) + F.pow(y2 - y1, 2))


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (get_distance with ``is_latlon=True`` —
    the reference goes through a UTM projection; haversine is the standard
    closed form for the same quantity)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def get_azimuth(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Azimuth between coordinate pairs (get_azimuth,
    gofast/utils/spatial_utils.py:5093) — the great-circle initial
    bearing; the reference's UTM-projection variant differs by <1 degree
    at survey scales."""
    return bearing_deg(lat1, lon1, lat2, lon2)


def bearing_deg(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Initial great-circle bearing in degrees [0, 360)
    (get_bearing, gofast/utils/spatial_utils.py:4975)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(rlat2)
    x = F.cos(rlat1) * F.sin(rlat2) - F.sin(rlat1) * F.cos(rlat2) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(y, x)) + 360.0, F.lit(360.0))
