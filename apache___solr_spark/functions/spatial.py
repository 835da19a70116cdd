"""Spatial function queries: geodist / geofilt / bbox.

Reference:
- solr/core/src/java/org/apache/solr/search/function/distance/
  HaversineConstFunction.java:57-77 — haversine against a constant point
  with EARTH_MEAN_DIAMETER = 2 * 6371.0087714 km (Lucene
  DistanceUtils.EARTH_MEAN_RADIUS_KM).
- SpatialFilterQParserPlugin.java ({!geofilt}) / {!bbox}: radius filter and
  its bounding-box relaxation.

Everything is pure column expressions (JVM codegen).  ``geofilt`` wraps the
exact haversine predicate in a coarse lat/lon BOUNDING-BOX prefilter: the
box is a sargable range predicate that Catalyst pushes into the parquet
scan (min/max row-group pruning, partition pruning on a lat/lon-derived
partition key), while the trig only runs on rows that survive it — at
100 TB the box is what keeps a radius query from touching every row group.
A box crossing the antimeridian splits into an OR of two lon ranges
(still sargable), matching the reference's two-range rewrite.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_MEAN_RADIUS_KM = 6371.0087714
_EARTH_MEAN_DIAMETER = EARTH_MEAN_RADIUS_KM * 2.0
_D2R = math.pi / 180.0
# km spanned by one degree of latitude (and of longitude at the equator)
_KM_PER_DEG = EARTH_MEAN_RADIUS_KM * _D2R

__all__ = ["geodist", "geofilt", "bbox_predicate", "EARTH_MEAN_RADIUS_KM"]


def geodist(
    lat_col, lon_col, lat_center: float, lon_center: float
) -> Column:
    """geodist() in km — HaversineConstFunction.java:57-77 exactly
    (atan2 form, mean-earth diameter)."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    lat_rad = lat.cast("double") * F.lit(_D2R)
    lon_rad = lon.cast("double") * F.lit(_D2R)
    lat_c = float(lat_center) * _D2R
    lon_c = float(lon_center) * _D2R
    hsin_x = F.sin((F.lit(lat_c) - lat_rad) * F.lit(0.5))
    hsin_y = F.sin((F.lit(lon_c) - lon_rad) * F.lit(0.5))
    h = hsin_x * hsin_x + (
        F.lit(math.cos(lat_c)) * F.cos(lat_rad) * hsin_y * hsin_y
    )
    return F.lit(_EARTH_MEAN_DIAMETER) * F.atan2(
        F.sqrt(h), F.sqrt(F.lit(1.0) - h)
    )


def bbox_predicate(
    lat_col, lon_col, lat_center: float, lon_center: float, d_km: float
) -> Column:
    """{!bbox}: the lat/lon box enclosing the d_km circle, as sargable
    range predicates.  Longitude width grows with 1/cos(lat); a box
    touching a pole degenerates to a full lon ring; a box crossing the
    antimeridian becomes an OR of two ranges."""
    lat = F.col(lat_col) if isinstance(lat_col, str) else lat_col
    lon = F.col(lon_col) if isinstance(lon_col, str) else lon_col
    d_lat = d_km / _KM_PER_DEG
    lat_lo, lat_hi = lat_center - d_lat, lat_center + d_lat
    pred = (lat >= F.lit(max(lat_lo, -90.0))) & (
        lat <= F.lit(min(lat_hi, 90.0))
    )
    if lat_lo <= -90.0 or lat_hi >= 90.0:
        return pred  # pole inside the box: every longitude qualifies
    # widest the circle gets in longitude is at its extreme latitude
    max_abs_lat = max(abs(lat_lo), abs(lat_hi))
    cos_lat = math.cos(max_abs_lat * _D2R)
    if cos_lat <= 0.0:
        return pred
    d_lon = d_km / (_KM_PER_DEG * cos_lat)
    if d_lon >= 180.0:
        return pred
    lon_lo, lon_hi = lon_center - d_lon, lon_center + d_lon
    if lon_lo < -180.0:
        return pred & (
            (lon >= F.lit(lon_lo + 360.0)) | (lon <= F.lit(lon_hi))
        )
    if lon_hi > 180.0:
        return pred & (
            (lon >= F.lit(lon_lo)) | (lon <= F.lit(lon_hi - 360.0))
        )
    return pred & (lon >= F.lit(lon_lo)) & (lon <= F.lit(lon_hi))


def geofilt(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat_center: float,
    lon_center: float,
    d_km: float,
    dist_alias: str | None = None,
) -> DataFrame:
    """{!geofilt}: exact radius filter = pushdown-able bbox prefilter AND
    the haversine predicate.  Optionally projects the distance."""
    box = bbox_predicate(lat_col, lon_col, lat_center, lon_center, d_km)
    dist = geodist(lat_col, lon_col, lat_center, lon_center)
    out = df.filter(box & (dist <= F.lit(float(d_km))))
    if dist_alias:
        out = out.withColumn(dist_alias, dist)
    return out
