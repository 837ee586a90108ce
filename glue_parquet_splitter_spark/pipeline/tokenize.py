"""Materialized tokenizer pipeline (VERDICT r11 #7) — the data-prep
twin of :mod:`.funnel`.

The shippable path encode → pack → manifest existed only as
independent queries (``wordpiece_encode`` / ``sequence_packing_ffd`` /
``training_mix_manifest``); this module lands it as parquet stage
tables, each a restartable job a production pipeline would checkpoint
between stages:

- ``tok_stats``  — per-doc tokenized corpus stats: whitespace token
  count (the packing currency), WordPiece token count (the fertility
  currency; >12-char words count 1 UNK piece), chars, lang, source.
- ``tok_bins``   — the sharded-FFD pack of ``tok_stats`` into
  128-token training sequences (bins namespaced (bucket, salt,
  bin_idx) — the ``sequence_packing_ffd`` recipe over the TABLE).
- ``tok_manifest`` — the training-mix manifest over the PACKED docs:
  Hamilton quotas per source (exact-sum, budget ``MANIFEST_BUDGET``)
  filled by deterministic md5(doc_id) order — the
  ``training_mix_manifest`` recipe, fed from the stage tables.

:func:`tokenizer_audit` rebuilds the per-source shipping report purely
from those tables — three stage scans + doc_id-keyed joins, no corpus
scan, no WordPiece machinery, no pandas FFD (plan-pinned in
tests/test_tokenizer_pipeline.py).  The registered query
``tokenizer_pipeline_audit`` grades the audit against ONE composed
DuckDB oracle that replays all three stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..staging import stage_table

STAGE_TABLES = ("tok_stats", "tok_bins", "tok_manifest")
MANIFEST_BUDGET = 120   # docs to apportion across sources (Hamilton)


def materialize_tokenizer_stages(spark: SparkSession, sf_dir: str,
                                 out_dir: str) -> dict[str, str]:
    """Run encode → pack → manifest, landing each stage as a parquet
    table under ``out_dir``; returns {table_name: path}.

    At 100 TB each write is a separate restartable job and each table
    is reusable by other consumers (the token stats feed curation
    audits, the bins feed the training loader, the manifest is the
    shipped artifact)."""
    from ..catalog import load_table
    from ..queries.curation6_q import ffd_pack
    from ..queries.tokenizer_q import _uni_words, _wp_greedy, _wp_stores

    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))

    # -- stage 1: tokenized corpus stats -------------------------------
    # staged: the word table feeds both store collects AND the
    # encode map — see unigram_lm_train's r15 note (lineage replay)
    words = stage_table(_uni_words(spark, sf_dir), label="uni_words")
    init_df, cont_df = _wp_stores(words)
    # bounded: singles + 2x32 multis — metadata-bounded collects (the
    # wordpiece_encode model-broadcast pattern)
    init_set = frozenset(r["piece"] for r in init_df.collect())
    cont_set = frozenset(r["piece"] for r in cont_df.collect())
    enc = words.mapInPandas(_wp_greedy(init_set, cont_set),
                            schema="w string, np long")
    parts = (d.select("doc_id",
                      F.explode(F.split("text", " ")).alias("w"))
             .filter(F.length("w") > 0))
    # words longer than the encoder's 12-char cap count 1 UNK piece
    per_doc_wp = (parts.join(enc, "w", "left")
                  .select("doc_id",
                          F.coalesce("np", F.lit(1)).alias("np"))
                  .groupBy("doc_id")
                  .agg(F.sum("np").cast("long").alias("n_wp_tokens")))
    tok_stats = (d.select(
        "doc_id", "lang", "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"))
        .join(per_doc_wp, "doc_id", "left")
        .select("doc_id", "lang", "source", "n_tokens", "n_chars",
                F.coalesce("n_wp_tokens", F.lit(0)).cast("long")
                .alias("n_wp_tokens")))

    # -- stage 2: packed bins (reads stage 1's TABLE, not the corpus) --
    paths = {"tok_stats": f"{out_dir}/tok_stats.parquet"}
    tok_stats.write.mode("overwrite").parquet(paths["tok_stats"])
    stats_t = spark.read.parquet(paths["tok_stats"])
    bins = ffd_pack(stats_t.select("doc_id",
                                   F.col("n_tokens").alias("toks")))
    paths["tok_bins"] = f"{out_dir}/tok_bins.parquet"
    bins.write.mode("overwrite").parquet(paths["tok_bins"])

    # -- stage 3: training-mix manifest over the PACKED docs -----------
    bins_t = spark.read.parquet(paths["tok_bins"])
    packed = (bins_t.select("doc_id")
              .join(stats_t.select("doc_id", "source"), "doc_id"))
    s = packed.groupBy("source").agg(F.count("*").alias("n_docs"))
    t = s.agg(F.sum("n_docs").cast("double").alias("n"))
    share = MANIFEST_BUDGET * F.col("n_docs") / F.col("n")
    q = (s.crossJoin(F.broadcast(t))  # bounded: 1-row total
         .select("source", "n_docs",
                 F.floor(share).cast("long").alias("base"),
                 (share - F.floor(share)).alias("rem")))
    from pyspark.sql import Window as W

    # bounded: |sources| rows — post-aggregate source dimension;
    # NULLS LAST tie-break (the training_mix_manifest convention)
    w_rem = W.orderBy(F.desc("rem"), F.asc_nulls_last("source"))
    r = q.withColumn("rk", F.row_number().over(w_rem))
    lo = q.agg((F.lit(MANIFEST_BUDGET) - F.sum("base")).alias("lo"))
    quota = (r.crossJoin(F.broadcast(lo))  # bounded: 1-row leftover
             .select("source",
                     (F.col("base")
                      + F.when(F.col("rk") <= F.col("lo"), 1)
                      .otherwise(0)).cast("long").alias("quota")))
    # total-order: packed is one row per doc_id (the packing stage's
    # output table), so the trailing doc_id breaks every md5 tie
    w_sel = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    ranked = packed.withColumn("rn", F.row_number().over(w_sel))
    manifest = (ranked.join(quota, ranked["source"].eqNullSafe(
        quota["source"]), "inner")
        .filter(F.col("rn") <= F.col("quota"))
        .select(ranked["source"], "doc_id"))
    paths["tok_manifest"] = f"{out_dir}/tok_manifest.parquet"
    manifest.write.mode("overwrite").parquet(paths["tok_manifest"])
    return paths


def tokenizer_audit(spark: SparkSession, stages_dir: str) -> DataFrame:
    """The per-source shipping report computed FROM the stage tables:
    three parquet scans, doc_id-keyed joins, one agg — no corpus scan,
    no encoder, no pandas FFD.  Per source: docs, whitespace tokens,
    WordPiece tokens, fertility (chars per WordPiece token), distinct
    bins touched, and manifest selections."""
    tok = spark.read.parquet(f"{stages_dir}/tok_stats.parquet")
    bins = (spark.read.parquet(f"{stages_dir}/tok_bins.parquet")
            .select("doc_id", "bucket", "salt", "bin_idx"))
    man = (spark.read.parquet(f"{stages_dir}/tok_manifest.parquet")
           .select("doc_id").withColumn("_sel", F.lit(1)))
    joined = (tok.join(bins, "doc_id", "left")
              .join(man, "doc_id", "left"))
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_ws_tokens"),
        F.sum("n_wp_tokens").cast("long").alias("n_wp_tokens"),
        F.round(F.try_divide(F.sum("n_chars"),
                             F.sum("n_wp_tokens").cast("double")), 4)
        .alias("chars_per_wp_token"),
        F.count_distinct("bucket", "salt", "bin_idx").alias("n_bins"),
        F.sum(F.coalesce("_sel", F.lit(0))).cast("long")
        .alias("n_manifest"))


_DEFAULT_STAGES_DIR: str | None = None


def _default_stages_dir() -> str:
    """Per-process singleton stage dir (the :mod:`.funnel` pattern):
    default-path runs overwrite the same three tables and atexit
    removes the dir."""
    global _DEFAULT_STAGES_DIR
    if _DEFAULT_STAGES_DIR is None:
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="tokenizer_stages_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _DEFAULT_STAGES_DIR = d
    return _DEFAULT_STAGES_DIR


def run_materialized_tokenizer(spark: SparkSession, sf_dir: str,
                               out_dir: str | None = None) -> DataFrame:
    """materialize → audit, end to end.  ``out_dir`` defaults to a
    per-process temp dir, overwritten each call and removed at exit;
    production passes a durable warehouse path and re-runs only the
    stages whose inputs changed."""
    out_dir = out_dir or _default_stages_dir()
    materialize_tokenizer_stages(spark, sf_dir, out_dir)
    return tokenizer_audit(spark, out_dir)
