"""Z-order layout: bit-level key correctness + min/max pruning win.

The point of a Morton key is file skipping: range-partition the write
by zval and every output file covers a small rectangle of the
(custkey, date) plane, so per-file min/max statistics prune box
queries on EITHER dimension.  A single-column sort only prunes its
own column — the comparison test makes that concrete.
"""

import glob

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table
from glue_parquet_splitter_spark.queries.graph_q import z_value


def _interleave_py(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_bit_level(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 56)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(z_value(F.col("x"), F.col("y")).alias("z")).collect()
    assert [r.z for r in got] == [_interleave_py(x, y) for x, y in rows]


def _file_ranges(pattern):
    """per-file (min,max) of custkey and epoch-day."""
    out = []
    for f in sorted(glob.glob(pattern)):
        r = duckdb.sql(
            f"""SELECT min(o_custkey), max(o_custkey),
                       min(date_diff('day', DATE '1992-01-01', o_orderdate)),
                       max(date_diff('day', DATE '1992-01-01', o_orderdate))
                FROM read_parquet('{f}')"""
        ).fetchone()
        out.append(r)
    return out


def _overlapping(ranges, ck=None, day=None):
    """files whose min/max box intersects the query box (None = no
    constraint on that dim) — exactly the footer-stats pruning test."""
    n = 0
    for ck_min, ck_max, d_min, d_max in ranges:
        if ck is not None and (ck_max < ck[0] or ck_min > ck[1]):
            continue
        if day is not None and (d_max < day[0] or d_min > day[1]):
            continue
        n += 1
    return n


def test_zorder_layout_prunes_both_dims(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff("o_orderdate", F.lit("1992-01-01"))
    bounds = o.agg(F.max("o_custkey").alias("ck_max"), F.max(day).alias("day_max"))
    x = F.floor(F.col("o_custkey").cast("double") * 256 / (F.col("ck_max") + 1))
    y = F.floor(day.cast("double") * 256 / (F.col("day_max") + 1))
    z = o.crossJoin(F.broadcast(bounds)).withColumn("zval", z_value(x, y, bits=8))

    # enough files that the z-curve has ~5 effective bits; at 8 files
    # the curve only splits each dim once or twice and the win is noise
    n_files = 32
    # layout A: classic single-column sort (custkey)
    (z.repartitionByRange(n_files, "o_custkey")
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(str(tmp_path / "by_custkey")))
    # layout B: z-ordered
    (z.repartitionByRange(n_files, "zval")
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(str(tmp_path / "by_zval")))

    ra = _file_ranges(str(tmp_path / "by_custkey" / "part-*.parquet"))
    rb = _file_ranges(str(tmp_path / "by_zval" / "part-*.parquet"))
    assert len(ra) > 4 and len(rb) > 4  # enough files for pruning to mean anything

    bounds = pd.DataFrame(ra, columns=["a", "b", "c", "d"])
    ck_lo, ck_hi = bounds.a.min(), bounds.b.max()
    d_lo, d_hi = bounds.c.min(), bounds.d.max()
    # narrow boxes positioned inside the observed ranges (~10% and ~4%)
    ck_box = (ck_lo + (ck_hi - ck_lo) * 40 // 100,
              ck_lo + (ck_hi - ck_lo) * 50 // 100)
    day_box = (d_lo + (d_hi - d_lo) * 40 // 100,
               d_lo + (d_hi - d_lo) * 44 // 100)

    # custkey-only query: BOTH layouts prune
    assert _overlapping(ra, ck=ck_box) <= len(ra) // 2
    assert _overlapping(rb, ck=ck_box) < len(rb)

    # date-only query: the custkey sort is blind (every file spans all
    # dates), the z-order still skips
    a_hit = _overlapping(ra, day=day_box)
    b_hit = _overlapping(rb, day=day_box)
    assert a_hit == len(ra), (a_hit, bounds)  # secondary dim unpruned
    assert b_hit < len(rb), (b_hit, rb)

    # whole-workload comparison (the claim z-order actually makes):
    # across a mix of ck-only / date-only / box queries the z layout
    # scans fewer files in total — it trades a little primary-dim
    # precision for pruning power on every dimension.
    total_a = sum(_overlapping(ra, **q) for q in
                  ({"ck": ck_box}, {"day": day_box},
                   {"ck": ck_box, "day": day_box}))
    total_b = sum(_overlapping(rb, **q) for q in
                  ({"ck": ck_box}, {"day": day_box},
                   {"ck": ck_box, "day": day_box}))
    assert total_b < total_a, (total_b, total_a)
