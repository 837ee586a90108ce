"""The packing family's QUALITY claims, measured engine-side (the
docstrings cite these numbers): backfill packing must recover the
fill that length-homogeneous FFD sharding gives up."""

from pyspark.sql import functions as F

from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()
CAP = 128


def _mean_fill(df):
    bins = df.groupBy(*[c for c in df.columns
                        if c in ("bucket", "salt", "bin_idx")]).agg(
        F.sum("toks").alias("fill"))
    row = bins.agg(F.avg("fill").alias("mf"),
                   F.max("fill").alias("mx")).collect()[0]
    return float(row.mf), int(row.mx)


def test_backfill_beats_homogeneous_ffd_fill(spark, sf_dir):
    ffd_mf, ffd_mx = _mean_fill(
        REG["sequence_packing_ffd"].fn(spark, sf_dir))
    bf_mf, bf_mx = _mean_fill(
        REG["sequence_packing_backfill"].fn(spark, sf_dir))
    # capacity invariant on both forms
    assert ffd_mx <= CAP and bf_mx <= CAP
    # the docstring's claim: backfill >= 95% mean fill, and strictly
    # better than the homogeneous-bucket pack
    assert bf_mf > 0.95 * CAP, bf_mf
    assert bf_mf > ffd_mf + 10, (bf_mf, ffd_mf)


def test_backfill_assignment_is_a_partition(spark, sf_dir):
    """Every doc appears exactly once across anchor + backfill +
    overflow bins."""
    out = REG["sequence_packing_backfill"].fn(spark, sf_dir)
    n_docs = out.count()
    n_distinct = out.select("doc_id").distinct().count()
    assert n_docs == n_distinct
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_docs == src
