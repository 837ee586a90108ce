"""Cloud (S3 / object-store) deployment profile.

The engine is scheme-agnostic — every source/sink path goes through the
Hadoop filesystem API (``pipeline/incremental.py``), so an S3 run is the
same code with ``s3a://`` URIs plus the connector tuning below.

The profile mirrors the reference deployment's client tuning
(reference ``src/Split/parquet-splitter.py:38-44``: retries
max_attempts=10, max_pool_connections=64, connect_timeout=10 s,
read_timeout=120 s; 24–48 writer threads via its thread pool) onto the
``fs.s3a.*`` equivalents, and adds the two settings every Spark-on-S3
job needs that a boto3 script does not: a zero-rename committer
(directory listings are not atomic on S3 — classic FileOutputCommitter
renames are both slow and unsafe) and multipart fast upload.

Usage — at session build time (hadoop confs are read when the
filesystem is first instantiated, so prefer builder-time)::

    builder = SparkSession.builder
    for k, v in s3a_profile().items():
        builder = builder.config(k, v)

or onto a live session (``apply_s3a_profile``) before the first
``s3a://`` access.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: reference client tuning → fs.s3a.* (values are strings as Hadoop wants)
S3A_PROFILE: dict[str, str] = {
    # retries: boto3 retries.max_attempts=10
    "spark.hadoop.fs.s3a.attempts.maximum": "10",
    "spark.hadoop.fs.s3a.retry.limit": "10",
    # connection pool: boto3 max_pool_connections=64
    "spark.hadoop.fs.s3a.connection.maximum": "64",
    # timeouts (ms): boto3 connect_timeout=10, read_timeout=120 (s)
    "spark.hadoop.fs.s3a.connection.establish.timeout": "10000",
    "spark.hadoop.fs.s3a.connection.timeout": "120000",
    # writer parallelism: reference used a 24–48-thread upload pool
    "spark.hadoop.fs.s3a.threads.max": "48",
    "spark.hadoop.fs.s3a.max.total.tasks": "64",
    # multipart upload, buffered to disk (bounded executor memory)
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.fast.upload.buffer": "disk",
    "spark.hadoop.fs.s3a.multipart.size": "67108864",  # 64 MiB parts
    # listing: incremental discovery over big day-prefixes
    "spark.hadoop.fs.s3a.paging.maximum": "1000",
    # zero-rename committer — task commits are uploads-not-yet-completed,
    # job commit completes the multiparts; no O(files) rename storm
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
}

#: binding the magic committer into the SQL write path needs the
#: ``spark-hadoop-cloud`` module (present on EMR/Dataproc/Databricks and
#: any ``-Phadoop-cloud`` build; ABSENT from pip-installed pyspark).
#: Kept separate because configuring the class when the jar is missing
#: does not fail fast: session initialization wedges on the first conf
#: access (observed on pyspark 4.1, local mode) — so these keys must
#: only be applied where the class is known to resolve.
S3A_COMMITTER_BINDING: dict[str, str] = {
    "spark.sql.sources.commitProtocolClass":
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class":
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
}

_CLOUD_COMMIT_CLASS = "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"


def cloud_committer_available(spark: SparkSession) -> bool:
    """True iff the spark-hadoop-cloud committer classes resolve in the
    session's JVM (i.e. the distribution shipped the hadoop-cloud module)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(_CLOUD_COMMIT_CLASS)
        return True
    except Exception:
        return False


def s3a_profile(committer_binding: bool = True) -> dict[str, str]:
    """A copy of the S3A conf profile (safe to mutate/extend).

    ``committer_binding=True`` (the cluster default) includes the
    PathOutputCommitProtocol SQL confs — require the spark-hadoop-cloud
    module on the classpath.  Pass ``False`` on pip/local builds (see
    ``S3A_COMMITTER_BINDING``); the fs.s3a.* tuning is always safe.
    """
    prof = dict(S3A_PROFILE)
    if committer_binding:
        prof.update(S3A_COMMITTER_BINDING)
    return prof


def apply_s3a_profile(spark: SparkSession) -> SparkSession:
    """Apply the profile onto a live session.

    ``spark.hadoop.*`` keys go into the Hadoop configuration (effective
    for filesystems instantiated afterwards); committer keys are SQL
    confs where runtime-settable.  Builder-time application is still
    preferred for a production job.
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    profile = s3a_profile(committer_binding=cloud_committer_available(spark))
    for k, v in profile.items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)
        else:
            try:
                spark.conf.set(k, v)
            except Exception as e:  # noqa: BLE001 — classified below
                msg = str(e)
                if "CANNOT_MODIFY" in msg or "static" in msg.lower():
                    # documented limitation: committer confs are static on
                    # some builds — must be set at builder time instead
                    pass
                else:
                    import warnings

                    warnings.warn(f"apply_s3a_profile: could not set {k}: {e}",
                                  stacklevel=2)
    return spark
