"""Dedup queries over ``documents`` (north-star surface, M4).

Every variant is deterministic, so even the MinHash/LSH and SimHash
paths carry full DuckDB oracles — the oracle SQL re-derives the same
salted-md5 hash family."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as D
from . import register


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@register(
    "dedup_exact",
    oracle="""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM documents GROUP BY text
    """,
    tags=("dedup",),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup, deterministic survivor policy: min doc_id per
    distinct text (hash-groupBy — one shuffle on the content key)."""
    d = _docs(spark, sf_dir)
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("n_copies"),
    ).select("doc_id", "n_copies")


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    tags=("dedup",),
)
def dedup_exact_hash(spark, sf_dir):
    """Exact dedup keyed on md5(content): at 100 TB the shuffle moves
    32-byte keys, not documents. Emits only the duplicate clusters."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


# The 8-hash family = 8-hex chunks of md5(shingle) and md5('x'||shingle);
# bands of 2 → 4 bucket signatures; elements are 3-word shingles.
# Mirrors operators/dedup.py exactly.
# toks + mh only (no banding): the band-tuning audit re-bands the same
# 8-hash signature four ways, so the signature CTEs are shared.
_MINHASH_MH_CTE = """
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, GREATEST(array_length(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tok
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
    ), mh AS (
      SELECT doc_id,
             MIN(substr(md5(tok), 1, 8))         AS m0,
             MIN(substr(md5(tok), 9, 8))         AS m1,
             MIN(substr(md5(tok), 17, 8))        AS m2,
             MIN(substr(md5(tok), 25, 8))        AS m3,
             MIN(substr(md5('x' || tok), 1, 8))  AS m4,
             MIN(substr(md5('x' || tok), 9, 8))  AS m5,
             MIN(substr(md5('x' || tok), 17, 8)) AS m6,
             MIN(substr(md5('x' || tok), 25, 8)) AS m7
      FROM toks GROUP BY doc_id
    )
"""

_MINHASH_ORACLE_CTE = _MINHASH_MH_CTE + """
    , bands AS (
      SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS sig FROM mh UNION ALL
      SELECT doc_id, 1 AS band, md5(m2 || '|' || m3) AS sig FROM mh UNION ALL
      SELECT doc_id, 2 AS band, md5(m4 || '|' || m5) AS sig FROM mh UNION ALL
      SELECT doc_id, 3 AS band, md5(m6 || '|' || m7) AS sig FROM mh
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
                               AND a.doc_id < b.doc_id
    )
"""


@register(
    "minhash_lsh_candidates",
    oracle=_MINHASH_ORACLE_CTE + """
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b
    FROM pairs
    """,
    tags=("dedup", "lsh"),
)
def minhash_lsh_candidates(spark, sf_dir):
    """MinHash(8 hashes over 3-word shingles) + LSH(4 bands × 2)
    candidate pairs."""
    d = _docs(spark, sf_dir)
    return D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))


@register(
    "minhash_dedup_verified",
    oracle=_MINHASH_ORACLE_CTE + """
    , sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM toks GROUP BY doc_id),
    common AS (
      SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.doc_a
      JOIN toks tb ON tb.doc_id = p.doc_b AND tb.tok = ta.tok
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT CAST(c.doc_a AS BIGINT) AS doc_a, CAST(c.doc_b AS BIGINT) AS doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_tok + sb.n_tok - n_common), 4) >= 0.5
    """,
    tags=("dedup", "lsh"),
)
def minhash_dedup_verified(spark, sf_dir):
    """LSH candidates verified with exact shingle-set Jaccard ≥ 0.5 —
    the verify stage touches only candidate pairs, not the corpus."""
    d = _docs(spark, sf_dir)
    toks = D.shingles(d, distinct=True)
    pairs = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    j = D.jaccard(pairs, toks).withColumn("jaccard", F.round("jaccard", 4))
    return j.filter(F.col("jaccard") >= 0.5).select("doc_a", "doc_b", "jaccard")


def _simhash_oracle() -> str:
    HEX = "0123456789abcdef"
    sums = []
    for j in range(16):
        nib_idx, bit_in_nib = j // 4, j % 4
        nib = f"(instr('{HEX}', substr(h, {nib_idx + 1}, 1)) - 1)"
        bit = f"(CAST(FLOOR({nib} / {2 ** (3 - bit_in_nib)}.0) AS INT) % 2)"
        sums.append(f"SUM(2 * {bit} - 1) AS s{j}")
    bits = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2 ** (15 - j)} ELSE 0 END)" for j in range(16)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
    ), hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
    sums AS (SELECT doc_id, {', '.join(sums)} FROM hashed GROUP BY doc_id),
    sigs AS (SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums)
    SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id
    FROM sigs GROUP BY simhash HAVING COUNT(*) > 1
    """


@register("simhash_clusters", oracle=_simhash_oracle(), tags=("dedup", "simhash"))
def simhash_clusters(spark, sf_dir):
    """16-bit SimHash dup clusters (identical signature, >1 doc)."""
    d = _docs(spark, sf_dir)
    sig = D.simhash16(d)
    return (
        sig.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, GREATEST(array_length(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)
    ), sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
                  JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.3
    """,
    tags=("dedup", "ngram"),
)
def ngram_jaccard_pairs(spark, sf_dir):
    """3-word-shingle Jaccard near-dup pairs (≥ 0.3). Shingling makes
    the self-join key high-cardinality, so the bucket join stays sparse
    even when the raw vocabulary is tiny."""
    d = _docs(spark, sf_dir)
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    shingle_expr = F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"),
    ).otherwise(F.expr("array()"))
    sh = (
        t.select("doc_id", F.explode(shingle_expr).alias("shingle")).distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    )
    j = (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn("jaccard", F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4))
    )
    return j.filter(F.col("jaccard") >= 0.3).select("doc_a", "doc_b", "jaccard")


@register(
    "jaccard_prefix_filter_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               UNNEST(list_transform(range(1, GREATEST(array_length(t) - 1, 1)),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
        FROM toks)
    ), sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
           ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
    FROM common c JOIN sizes sa ON sa.doc_id = c.doc_a
                  JOIN sizes sb ON sb.doc_id = c.doc_b
    WHERE ROUND(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 4) >= 0.5
    """,
    tags=("dedup", "ngram", "scale"),
)
def jaccard_prefix_filter_pairs(spark, sf_dir):
    """EXACT Jaccard ≥ 0.5 pair search via PREFIX FILTERING (the
    PPJoin family) — the deterministic counterpart of MinHash/LSH:
    no false negatives by construction, no signatures to tune.

    Order every document's shingles canonically (ascending document
    frequency, then shingle — rarest first).  If J(A,B) ≥ t then
    |A∩B| ≥ t·|A|, so A's first ``|A| − ceil(t·|A|) + 1`` ordered
    shingles must hit the intersection: a qualifying pair SHARES a
    token in both PREFIXES.  Candidates therefore come from joining
    only prefix tokens — the frequency ordering puts the RAREST
    shingles in the prefix, so the candidate join is far sparser than
    the all-token join (``ngram_jaccard_pairs``), and the exact
    verify runs only on candidates.

    The oracle is the naive all-pairs-by-token form at the same
    threshold; the hash gate proves the filter lossless.  Scale: df
    counts and prefix ranks are one groupBy + one per-doc window over
    already-deduped (doc, shingle) rows; candidate generation joins
    the prefix relation to itself on the shingle key.
    """
    d = _docs(spark, sf_dir)
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    shingle_expr = F.when(
        F.size("t") >= 3,
        F.expr("transform(sequence(0, size(t) - 3), "
               "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"),
    ).otherwise(F.expr("array()"))
    sh = t.select("doc_id", F.explode(shingle_expr).alias("shingle")).distinct()
    return D.prefix_filtered_jaccard_pairs(sh, threshold=0.5)


# the shared chain, restricted to the deterministic 10% audit sample
_MINHASH_SAMPLED_CTE = _MINHASH_ORACLE_CTE.replace(
    "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)",
    "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents"
    " WHERE doc_id % 10 = 0)")


@register(
    "minhash_eval_pr",
    oracle=_MINHASH_SAMPLED_CTE + """
    , sz AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    overlap AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS nc
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), truth AS (
      SELECT doc_a, doc_b
      FROM overlap JOIN sz x ON x.doc_id = overlap.doc_a
      JOIN sz y ON y.doc_id = overlap.doc_b
      WHERE CAST(nc AS DOUBLE) / (x.n + y.n - nc) >= 0.5
    ), hit AS (
      SELECT COUNT(*) AS n_hit
      FROM pairs JOIN truth USING (doc_a, doc_b)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sz) AS n_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_cand,
           CAST(hit.n_hit AS BIGINT) AS n_hit,
           ROUND(CAST(hit.n_hit AS DOUBLE)
                 / GREATEST((SELECT COUNT(*) FROM pairs), 1), 6)
             AS precision_at_05,
           ROUND(CAST(hit.n_hit AS DOUBLE)
                 / GREATEST((SELECT COUNT(*) FROM truth), 1), 6)
             AS recall_at_05
    FROM hit
    """,
    tags=("dedup", "eval", "lsh", "stats"),
)
def minhash_eval_pr(spark, sf_dir):
    """Measured precision/recall of the MinHash-LSH candidate
    generator against EXACT shingle-set Jaccard ground truth (relevant
    = J ≥ 0.5), on a deterministic 10 % audit sample — the eval run
    before trusting a dedup config at corpus scale: LSH's (bands,
    rows) knob trades recall for candidate volume, and this query
    turns that theoretical S-curve into a measured number on YOUR
    data.  The audit-sample protocol is what makes ground truth
    computable: exact Jaccard needs the pair overlap counts that the
    full corpus cannot afford, but a fixed-fraction sample can.

    Scale: the sample filter is pushed into the scan; truth pairs
    come from the shingle inverted-index join over SAMPLE docs only
    (pairs with zero overlap can't reach J ≥ 0.5, so no all-pairs
    materialization even within the sample); the candidate arm is the
    production chain (``operators.dedup``) unchanged, restricted to
    the sample; the scalars reduce to one row.

    Determinism: md5 minhashes, integer overlap counts, exact
    rational Jaccard compare, rounded P/R with GREATEST(.,1) guards.
    """
    d = _docs(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    toks = D.shingles(d, distinct=True)
    cand = D.candidate_pairs(D.lsh_bands(D.minhash_signatures(d)))
    sz = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    overlap = (ta.join(tb, "tok")
               .filter(F.col("doc_a") < F.col("doc_b"))
               .groupBy("doc_a", "doc_b").agg(F.count("*").alias("nc")))
    truth = (overlap
             .join(sz.select(F.col("doc_id").alias("doc_a"),
                             F.col("n").alias("na")), "doc_a")
             .join(sz.select(F.col("doc_id").alias("doc_b"),
                             F.col("n").alias("nb")), "doc_b")
             .filter(F.col("nc").cast("double")
                     / (F.col("na") + F.col("nb") - F.col("nc")) >= 0.5)
             .select("doc_a", "doc_b"))
    n_docs = sz.agg(F.count("*").alias("n_docs"))
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_cand = cand.agg(F.count("*").alias("n_cand"))
    n_hit = (cand.join(truth, ["doc_a", "doc_b"])
             .agg(F.count("*").alias("n_hit")))
    # bounded: all four sides are 1-row scalar aggregates
    return (n_docs.crossJoin(F.broadcast(n_truth))
            .crossJoin(F.broadcast(n_cand))
            .crossJoin(F.broadcast(n_hit))
            .select("n_docs", "n_truth", "n_cand", "n_hit",
                    F.round(F.col("n_hit").cast("double")
                            / F.greatest(F.col("n_cand"), F.lit(1)), 6)
                     .alias("precision_at_05"),
                    F.round(F.col("n_hit").cast("double")
                            / F.greatest(F.col("n_truth"), F.lit(1)), 6)
                     .alias("recall_at_05")))


def _band_tuning_oracle() -> str:
    """Re-band the SAME 8-hash signature four ways — (bands, rows):
    (8,1), (4,2), (2,4), (1,8) — and count candidate pairs for each;
    the LSH S-curve tuning table."""
    parts = [_MINHASH_MH_CTE]
    selects = []
    sep = " || '|' || "
    for r in (1, 2, 4, 8):
        b = 8 // r
        bands = " UNION ALL ".join(
            f"SELECT doc_id, {i} AS band, "
            f"md5({sep.join(f'm{i * r + j}' for j in range(r))})"
            f" AS sig FROM mh"
            for i in range(b))
        parts.append(f""",
    bands_r{r} AS ({bands}),
    pairs_r{r} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands_r{r} a JOIN bands_r{r} b
        ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""")
        selects.append(
            f"SELECT {b} AS n_bands, {r} AS rows_per_band,"
            f" CAST((SELECT COUNT(*) FROM pairs_r{r}) AS BIGINT)"
            f" AS n_candidates,"
            f" CAST({round((1 / b) ** (1 / r), 4)} AS DOUBLE) AS thresh_est")
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(selects)


@register(
    "lsh_band_tuning_audit",
    oracle=_band_tuning_oracle(),
    tags=("dedup", "lsh", "agg"),
)
def lsh_band_tuning_audit(spark, sf_dir):
    """The LSH S-curve tuning table: one 8-hash MinHash signature,
    re-banded four ways — (bands×rows) = 8×1, 4×2, 2×4, 1×8 — with
    the candidate-pair count each banding yields and its estimated
    Jaccard threshold t ≈ (1/b)^(1/r).  More bands → lower threshold
    → more candidates (recall↑, verify cost↑); the table is how a
    deployment picks the banding BEFORE running the expensive verify
    stage at full scale.

    Scale: the signature aggregation (the only corpus-sized work)
    is computed from one shared lineage; each banding adds a
    band-keyed self-join over (doc, band, sig) rows — the same
    bucket-join shape as production LSH, never all-pairs.  Both
    engines compute the threshold constant from the same literal.
    """
    d = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures(d)
    out = None
    for r in (1, 2, 4, 8):
        b = 8 // r
        cnt = (D.candidate_pairs(D.lsh_bands(sig, band_size=r))
               .agg(F.lit(b).alias("n_bands"),
                    F.lit(r).alias("rows_per_band"),
                    F.count("*").alias("n_candidates"),
                    F.lit(round((1 / b) ** (1 / r), 4)).alias("thresh_est")))
        out = cnt if out is None else out.unionByName(cnt)
    return out


@register(
    "lsh_bucket_skew_audit",
    oracle=_MINHASH_ORACLE_CTE + """
    , bs AS (
      SELECT band, sig, CAST(COUNT(*) AS BIGINT) AS c
      FROM bands GROUP BY band, sig)
    SELECT CAST(band AS INT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(c) AS BIGINT) AS max_bucket,
           CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS implied_pairs,
           ROUND(MAX(c * (c - 1) / 2)
                 / CAST(GREATEST(SUM(c * (c - 1) / 2), 1) AS DOUBLE), 4)
             AS skew_frac
    FROM bs GROUP BY band
    """,
    tags=("dedup", "lsh", "agg"),
)
def lsh_bucket_skew_audit(spark, sf_dir):
    """THE production LSH incident detector: per band, the bucket-size
    distribution and the fraction of the band's implied pairwise work
    (Σ c·(c−1)/2) concentrated in its single hottest bucket.  A
    boilerplate-dominated bucket makes one task do a c² self-join
    while every other task idles — ``skew_frac`` near 1 says salt the
    bucket key or DF-cap the fingerprints BEFORE running the pair
    join; the audit costs one aggregate over (band, sig) counts,
    nothing pairs.

    All-integer arithmetic (counts and exact pair formulas) — the
    only double is the final ratio of two exact integers, identical
    in both engines.
    """
    d = _docs(spark, sf_dir)
    bands = D.lsh_bands(D.minhash_signatures(d))
    bs = bands.groupBy("band", "sig").agg(F.count("*").alias("c"))
    pairs_c = (F.col("c") * (F.col("c") - 1) / 2).cast("long")
    return (bs.groupBy("band")
            .agg(F.count("*").alias("n_buckets"),
                 F.max("c").cast("long").alias("max_bucket"),
                 F.sum(pairs_c).cast("long").alias("implied_pairs"),
                 F.round(F.max(pairs_c)
                         / F.greatest(F.sum(pairs_c), F.lit(1))
                         .cast("double"), 4).alias("skew_frac"))
            .select(F.col("band").cast("int").alias("band"),
                    "n_buckets", "max_bucket", "implied_pairs",
                    "skew_frac"))
