"""Streaming CDC apply: foreachBatch upsert sink (M3 × warehouse).

Structured Streaming has no built-in MERGE sink without a table format,
but the standard topology is: reduce each micro-batch to one row per
key, then inside ``foreachBatch`` apply it onto the keyed target with
dynamic partition overwrite — only the key-partitions present in the
batch are rewritten, and re-running a batch rewrites the same
partitions with the same content (idempotent, so checkpoint replay
after a crash is safe: exactly-once state, at-least-once effects).

Scale: the target is partitioned by a bounded key bucket (not the raw
key — billions of tiny dirs would break any object store listing); a
micro-batch touching k buckets rewrites only those bucket files.  The
read-modify-write joins the batch against ONLY those buckets via
partition pruning on the bucket column.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..staging import stage_table

N_BUCKETS = 16


def _latest_per_key(df: DataFrame, key: str, order: str, tie: str) -> DataFrame:
    # the tie column makes same-timestamp winners deterministic — the
    # idempotent-replay contract needs identical content on re-run
    # total-order: caller contract — (order, tie) must be total per key.
    # The registered stream passes (ts, event_id) over the events source,
    # whose duplicate-identity hostility is resolved at ingest (see
    # operators/events.py); byte-identical replays tie harmlessly (every
    # column of the kept row is equal)
    w = Window.partitionBy(key).orderBy(F.desc(order), F.desc(tie))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1).drop("__rn"))


def run_upsert_stream(spark: SparkSession, in_path: str, target_dir: str,
                      key: str = "user_id", order: str = "ts",
                      tie: str = "event_id",
                      checkpoint_dir: str | None = None) -> None:
    """Drain ``in_path`` (availableNow), maintaining ``target_dir`` as
    the latest-row-per-key table, partitioned by a 16-way key bucket."""
    from pyspark.errors import AnalysisException

    from .windows import events_stream

    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="upsert_ckpt_")
    stream = events_stream(spark, in_path)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = _latest_per_key(batch_df, key, order, tie)
        batch = batch.withColumn("__bucket", F.pmod(F.hash(key), N_BUCKETS))
        # the batch feeds two actions (bucket list + merge): persist so
        # the dedup window runs once per micro-batch, not twice
        batch = batch.persist()
        try:
            try:
                current = spark.read.parquet(target_dir)
            except AnalysisException as e:
                # ONLY a missing target means "first batch" — any other
                # analysis failure (schema drift, missing __bucket) must
                # surface, not silently drop the stored keys.  Match the
                # error class where the API exposes it (PySpark 3.4+ /
                # 4.x), with a message-substring fallback for older
                # distributions whose message is "Path does not exist".
                klass = None
                for getter in ("getCondition", "getErrorClass"):
                    try:
                        klass = getattr(e, getter)()
                    except Exception:
                        klass = None
                    if klass:
                        break
                missing = (klass == "PATH_NOT_FOUND" if klass else
                           ("PATH_NOT_FOUND" in str(e)
                            or "Path does not exist" in str(e)))
                if not missing:
                    raise
                merged = batch
            else:
                # driver-side list is bounded by N_BUCKETS ids (ints),
                # never by batch row count — safe at any batch size
                buckets = [r["__bucket"] for r in
                           batch.select("__bucket").distinct().collect()]
                # partition pruning: only the touched buckets are read back
                current = current.where(F.col("__bucket").isin(buckets))
                merged = _latest_per_key(
                    current.unionByName(batch), key, order, tie
                )
            # materialize before overwriting the path we just read from —
            # a lazy plan would scan files the write is deleting
            merged = stage_table(merged, label="upsert_merge",
                                 eager=True, must_cut=True)
            (merged.write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("__bucket").parquet(target_dir))
        finally:
            batch.unpersist()

    q = (stream.writeStream.foreachBatch(apply_batch)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination()
