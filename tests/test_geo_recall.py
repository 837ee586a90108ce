"""Recall proof for the latitude-adaptive proximity join (ADVICE r5):
the driver's hash gate cannot see a recall gap when the query and its
oracle share the ring formula, so this test compares the ring join
against an O(n²) brute force on POLAR-HEAVY synthetic points — the
exact geometry the fixed 3x3 ring misses above ~63°."""

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.queries.geo_q import (
    EARTH_KM,
    RADIUS_KM,
    adaptive_ring_pairs,
)


def _points():
    """Deterministic points biased to high latitude: polar caps and a
    mid/equator band, longitudes spread over the full circle (wrap
    pairs across the ±180 seam included)."""
    rows = []
    for i in range(260):
        band = i % 4
        if band == 0:      # north polar cap 63..90 — the gap region
            lat = 63.0 + (i * 7919 % 2700) / 100.0
        elif band == 1:    # south polar cap
            lat = -90.0 + (i * 104729 % 2700) / 100.0
        elif band == 2:    # the ~63° boundary itself
            lat = 55.0 + (i * 31 % 1600) / 100.0
        else:              # control: equatorial band
            lat = -20.0 + (i * 17 % 4000) / 100.0
        lon = -180.0 + (i * 48611 % 36000) / 100.0
        rows.append((i, lat, lon))
    return pd.DataFrame(rows, columns=["c_custkey", "lat", "lon"])


def _haversine_km(a_lat, a_lon, b_lat, b_lon):
    h = (math.sin(math.radians(b_lat - a_lat) / 2) ** 2
         + math.cos(math.radians(a_lat)) * math.cos(math.radians(b_lat))
         * math.sin(math.radians(b_lon - a_lon) / 2) ** 2)
    return 2 * EARTH_KM * math.asin(math.sqrt(h))


def test_adaptive_ring_matches_brute_force_at_poles(spark):
    pdf = _points()
    pts = (spark.createDataFrame(pdf)
           .withColumns({"cell_lat": F.floor(F.col("lat") / 10),
                         "cell_lon": F.floor(F.col("lon") / 10)}))
    got = {(r.custkey_a, r.custkey_b)
           for r in adaptive_ring_pairs(pts).collect()}

    want = {
        (int(a.c_custkey), int(b.c_custkey))
        for _, a in pdf.iterrows() for _, b in pdf.iterrows()
        if a.c_custkey < b.c_custkey
        and _haversine_km(a.lat, a.lon, b.lat, b.lon) <= RADIUS_KM
    }
    # the polar caps must actually exercise wide rings, or this test
    # proves nothing: demand a healthy number of >63° pairs
    polar = {(a, b) for a, b in want
             if abs(pdf.lat[a]) > 63 and abs(pdf.lat[b]) > 63}
    assert len(polar) >= 50, f"fixture too equatorial: {len(polar)}"

    missed = want - got
    extra = got - want
    assert not missed, f"recall gap: {sorted(missed)[:10]}"
    assert not extra, f"phantom/duplicate pairs: {sorted(extra)[:10]}"
    # found EXACTLY once: the DataFrame row count equals the set size
    assert adaptive_ring_pairs(pts).count() == len(got)


def test_fixed_ring_demonstrably_misses_polar_pairs(spark):
    """Negative control: the 3x3 ring on the same polar points DOES
    miss pairs — proving the fixture exposes the gap the adaptive ring
    closes (if this starts passing, the fixture stopped testing
    anything)."""
    pdf = _points()
    pts = (spark.createDataFrame(pdf)
           .withColumns({"cell_lat": F.floor(F.col("lat") / 10),
                         "cell_lon": F.floor(F.col("lon") / 10)}))
    ring = F.array(*[
        F.struct(F.lit(i).alias("dlat"), F.lit(j).alias("dlon"))
        for i in (-1, 0, 1) for j in (-1, 0, 1)
    ])
    repl = pts.withColumn("d", F.explode(ring)).select(
        "c_custkey", "lat", "lon",
        (F.col("cell_lat") + F.col("d.dlat")).alias("rcell_lat"),
        (((F.col("cell_lon") + 18 + F.col("d.dlon")) % 36 + 36) % 36 - 18)
        .alias("rcell_lon"),
    )
    a, b = repl.alias("a"), pts.alias("b")
    hav = 2 * EARTH_KM * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(F.col("b.lat") - F.col("a.lat")) / 2), 2)
        + F.cos(F.radians("a.lat")) * F.cos(F.radians("b.lat"))
        * F.pow(F.sin(F.radians(F.col("b.lon") - F.col("a.lon")) / 2), 2)))
    fixed = (
        a.join(b, on=[F.col("a.rcell_lat") == F.col("b.cell_lat"),
                      F.col("a.rcell_lon") == F.col("b.cell_lon"),
                      F.col("a.c_custkey") < F.col("b.c_custkey")])
        .where(hav <= RADIUS_KM)
        .select(F.col("a.c_custkey").alias("ka"),
                F.col("b.c_custkey").alias("kb"))
    )
    n_fixed = fixed.count()
    n_adaptive = adaptive_ring_pairs(pts).count()
    assert n_fixed < n_adaptive, (n_fixed, n_adaptive)
