"""Additional source/sink formats: ORC, compression codecs, binary-file
ingestion (the multimodal media-landing path)."""

import os

from pyspark.sql import functions as F

from glue_parquet_splitter_spark.catalog import load_table

SAMPLE = "/root/reference/sample-data/data/input"


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "nation")
    p = str(tmp_path / "orc")
    d.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.count() == d.count()
    assert sorted(back.columns) == sorted(d.columns)


def test_parquet_codecs(spark, sf_dir, tmp_path):
    """zstd/gzip/snappy parquet round-trips (codec is a config swap)."""
    d = load_table(spark, sf_dir, "region")
    for codec, ext in [("zstd", ".zstd.parquet"), ("gzip", ".gz.parquet"),
                       ("snappy", ".snappy.parquet")]:
        p = str(tmp_path / codec)
        d.write.mode("overwrite").option("compression", codec).parquet(p)
        assert spark.read.parquet(p).count() == d.count()
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        assert files and all(f.endswith(ext) for f in files)


def test_binary_file_ingestion(spark):
    """binaryFile source: land media objects as (path, length, content)
    rows — the ingestion path for the multimodal operators, which then
    decode via mapInPandas (operators/multimodal.py)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(SAMPLE)
        .select("path", "length", "content")
    )
    rows = df.collect()
    assert len(rows) == 3
    for r in rows:
        real = os.path.getsize(r.path.replace("file:", ""))
        assert r.length == real == len(r.content)
