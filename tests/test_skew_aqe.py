"""AQE skew-join evidence (M5): a pathologically skewed key must be
split at runtime instead of serializing one reducer."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark, tmp_path):
    # left: 400k rows, 95% on one key, with an incompressible payload —
    # skew detection measures COMPRESSED shuffle bytes, and a
    # constant-key partition without payload compresses below any
    # realistic threshold
    left = spark.range(400_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    left.write.parquet(lp)
    right.write.parquet(rp)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        # NB: aggregate on a non-join key — re-using the join key downstream
        # would demand hashpartitioning(k) and legally disable skew splitting
        j = (
            spark.read.parquet(lp)
            .join(spark.read.parquet(rp), "k")
            .agg(F.count("pad").alias("n"), F.sum("w").alias("sw"))
        )
        rows = j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert rows[0].n == 400_000
        assert "skew=true" in plan, plan[:800]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
