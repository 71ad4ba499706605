"""Geospatial primitives: spherical distance + latitude-adaptive geo-cell grid.

Replaces the reference's Neo4j POINT index + haversine bounding-box prefilter
(/root/reference/scripts/linkers/link_spatial_optimized.py:35-55 and
docs/planning/SPATIAL_LINKING_OPTIMIZED.md:18-44) with the idiomatic Spark
shape: assign every row a cell id, explode the probe side over the cells
covering its search radius, equi-join on cell, refine with a vectorized
haversine. The equi-join shuffles on cell id, so Catalyst/AQE handle
partitioning and skew (hot urban cells) natively.

Grid: latitude bands of ``BAND_DEG`` degrees; within each band, longitude is
split into cells of roughly equal *physical* width (the band's cell count
shrinks with cos(latitude)), so recall at high latitude does not collapse —
the reference's pole-clamp concern (link_spatial_optimized.py:46-48).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_KM = 6371.0088
KM_PER_DEG_LAT = 111.0  # slightly under the true 111.195 → wider, safer cover
BAND_DEG = 0.25         # ~28 km band height (> the 10 km default radius)
N_BANDS = int(180 / BAND_DEG)
LON_BITS = 21           # max cells per band = 360/0.25 = 1440 << 2^21


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, pure Column math (whole-stage codegen).

    Same formula as the reference's calculate_distance
    (scripts/linkers/link_hgis_to_lod.py:146-160).
    """
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = F.pow(F.sin(dlat), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon), 2)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


HAVERSINE_SQL_DUCKDB = (
    "2.0 * 6371.0088 * asin(sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2.0), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * "
    "pow(sin(radians({lon2} - {lon1}) / 2.0), 2)))"
)


def _band_of(lat: np.ndarray) -> np.ndarray:
    b = np.floor((lat + 90.0) / BAND_DEG).astype(np.int64)
    return np.clip(b, 0, N_BANDS - 1)


def _n_lon_cells(band: np.ndarray) -> np.ndarray:
    """Cells per band, sized so each cell is >= BAND_DEG of physical width."""
    lo = band * BAND_DEG - 90.0
    hi = lo + BAND_DEG
    phi = np.minimum(np.maximum(np.abs(lo), np.abs(hi)), 89.9)
    width_deg = BAND_DEG / np.maximum(0.01, np.cos(np.radians(phi)))
    return np.maximum(1, np.floor(360.0 / width_deg).astype(np.int64))


def _lon_idx(lon: np.ndarray, n: np.ndarray) -> np.ndarray:
    frac = (np.mod(lon + 180.0, 360.0)) / 360.0
    return np.minimum((frac * n).astype(np.int64), n - 1)


def cell_ids_np(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    band = _band_of(lat)
    n = _n_lon_cells(band)
    return (band << LON_BITS) | _lon_idx(lon, n)


@F.pandas_udf(T.LongType())
def cell_id(lat: pd.Series, lon: pd.Series) -> pd.Series:
    """Single covering cell for a point (build side of the spatial join)."""
    return pd.Series(cell_ids_np(lat.to_numpy(float), lon.to_numpy(float)))


def make_cover_cells_udf(radius_km: float):
    """Cells intersecting the radius_km disc around each point (probe side).

    Arrow-batched; per-point output is tiny (typically 2 bands x <=3 cells).
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover_cells(lat: pd.Series, lon: pd.Series) -> pd.Series:
        la = lat.to_numpy(float)
        lo = np.mod(lon.to_numpy(float) + 180.0, 360.0) - 180.0
        r_deg = radius_km / KM_PER_DEG_LAT
        out = []
        for plat, plon in zip(la, lo):
            b0 = int(np.clip(np.floor((plat - r_deg + 90.0) / BAND_DEG), 0, N_BANDS - 1))
            b1 = int(np.clip(np.floor((plat + r_deg + 90.0) / BAND_DEG), 0, N_BANDS - 1))
            cells = []
            for b in range(b0, b1 + 1):
                lo_edge = b * BAND_DEG - 90.0
                phi = min(max(abs(lo_edge), abs(lo_edge + BAND_DEG)), 89.9)
                dlon = min(180.0, radius_km / (KM_PER_DEG_LAT * max(0.01, np.cos(np.radians(phi)))))
                n = int(_n_lon_cells(np.array([b]))[0])
                i0 = int(np.floor((plon - dlon + 180.0) / 360.0 * n))
                i1 = int(np.floor((plon + dlon + 180.0) / 360.0 * n))
                if i1 - i0 + 1 >= n:
                    idxs = range(n)
                else:
                    idxs = [i % n for i in range(i0, i1 + 1)]
                base = b << LON_BITS
                cells.extend(base | i for i in idxs)
            out.append(cells)
        return pd.Series(out)

    return cover_cells
