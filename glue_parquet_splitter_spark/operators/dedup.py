"""Deduplication operators for large-scale training-data pipelines.

All composed from built-in DataFrame ops (no Python in the hot path):

- exact dedup: hash-groupBy on content (or md5 of content, so the
  shuffle key is 32 bytes instead of the document).
- MinHash + LSH: deterministic minhash (min over md5(seed:token)) →
  banded signatures → bucket self-join for candidate pairs → exact
  Jaccard verification on candidates only. Deterministic by design so
  results are reproducible across engines/runs (and DuckDB-oracleable);
  at 100 TB the same plan holds: the token explode is map-side, the
  only wide shuffles are the per-(doc,seed) min-agg and the band
  bucket join, all on short hash keys.
- SimHash: 16-bit signature from per-token md5 nibbles, bit-majority
  aggregated — pure integer arithmetic, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..staging import stage_table

NUM_HASHES = 8
BAND_SIZE = 2  # → 4 bands of 2 hashes


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc, token) pairs — whitespace tokenization."""
    return (
        docs.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .distinct()
    )


def shingles(docs: DataFrame, n: int = 3, distinct: bool = False,
             carry: tuple = ()) -> DataFrame:
    """(doc_id, shingle) n-word shingles. MinHash runs over shingles,
    not words: word *sets* of natural/dup-prone corpora overlap almost
    completely across unrelated docs (word-level minhash bucketed ~9.5M
    false-candidate pairs on the 5k-doc fixture); n-word shingles make
    the element universe position-sensitive and sparse.

    ``carry`` names extra columns to ride through the explode (e.g.
    ``("source",)``) — duplicating a short attribute per shingle
    map-side is free, while joining it back on doc_id afterwards would
    shuffle the whole gram stream."""
    t = docs.select("doc_id", *carry, F.split("text", " ").alias("t"))
    expr = F.when(
        F.size("t") >= n,
        F.expr(
            f"transform(sequence(0, size(t) - {n}), "
            f"i -> concat_ws(' ', {', '.join(f't[i+{j}]' for j in range(n))}))"
        ),
    ).otherwise(F.expr("array()"))
    out = t.select("doc_id", *carry, F.explode(expr).alias("tok"))
    return out.distinct() if distinct else out


def minhash_signatures(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Wide signature row (doc_id, m0..m7): the 8 hash functions are
    the 8-hex-char chunks of md5(tok) and md5('x'||tok), minimized per
    doc in ONE narrow aggregation.

    Scale shape: per-token work is two md5s computed map-side; the
    only shuffle is a groupBy(doc_id) over 8 short string columns — no
    seed cross-join, no row multiplication (the naive seeds×tokens
    expansion benched 20× slower at sf0.1).
    """
    # multiset shingles suffice: MIN is insensitive to duplicates, so
    # we skip the (doc, shingle) distinct — one less full shuffle.
    # Each salted md5 yields four 8-hex chunks; more hashes → more salts.
    toks = shingles(docs)
    n_md5 = -(-num_hashes // 4)  # ceil
    salts = [F.md5("tok") if s == 0 else F.md5(F.concat(F.lit("x" * s), F.col("tok")))
             for s in range(n_md5)]
    chunks = [
        F.substring(salts[i // 4], 1 + 8 * (i % 4), 8).alias(f"c{i}")
        for i in range(num_hashes)
    ]
    return (
        toks.select("doc_id", *chunks)
        .groupBy("doc_id")
        .agg(*[F.min(f"c{i}").alias(f"m{i}") for i in range(num_hashes)])
    )


def lsh_bands(signatures: DataFrame, band_size: int = BAND_SIZE,
              num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, band, sig): md5 over each band's minhashes (band i =
    hashes [i*band_size, (i+1)*band_size)), unpivoted via stack."""
    n_bands = num_hashes // band_size
    entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"m{b * band_size + j}") for j in range(band_size)])).alias("sig"),
        )
        for b in range(n_bands)
    ])
    return (
        signatures.select("doc_id", F.explode(entries).alias("e"))
        .select("doc_id", F.col("e.band").alias("band"), F.col("e.sig").alias("sig"))
    )


def candidate_pairs(bands: DataFrame) -> DataFrame:
    """Docs sharing any band bucket → (doc_a < doc_b) candidate pairs."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard(pairs: DataFrame, toks: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs only (cheap: the
    candidate set is tiny relative to the corpus)."""
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    ta = toks.select(F.col("doc_id").alias("doc_a"), "tok")
    tb = toks.select(F.col("doc_id").alias("doc_b"), "tok")
    common = (
        pairs.join(ta, "doc_a").join(tb, ["doc_b", "tok"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_tok": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_tok": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from the first 4 hex nibbles of each
    distinct token's md5; majority vote per bit. Pure built-ins."""
    toks = tokens(docs).withColumn("h", F.md5("tok"))
    HEX = "0123456789abcdef"
    bit_cols = []
    for j in range(16):
        nib_idx, bit_in_nib = j // 4, j % 4
        # nibble value = position of the hex char in the alphabet
        nib = F.expr(f"instr('{HEX}', substr(h, {nib_idx + 1}, 1))") - 1
        bit = F.floor(nib / (2 ** (3 - bit_in_nib))).cast("int") % 2
        bit_cols.append((2 * bit - 1).alias(f"b{j}"))
    per_tok = toks.select("doc_id", *bit_cols)
    agg = per_tok.groupBy("doc_id").agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(16)]
    )
    sim = F.lit(0)
    for j in range(16):
        sim = sim + F.when(F.col(f"s{j}") > 0, F.lit(2 ** (15 - j))).otherwise(F.lit(0))
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def prefix_filtered_jaccard_pairs(sh: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard ≥ ``threshold`` pairs over a distinct
    ``(doc_id, shingle)`` relation via PPJoin-style prefix filtering.

    Canonical element order = ascending document frequency, then
    shingle (rarest first).  If J(A,B) ≥ t then |A∩B| ≥ t·|A|, so the
    first ``|A| − ceil(t·|A|) + 1`` ordered elements of A must hit the
    intersection — a qualifying pair shares an element in both
    prefixes, and joining only prefix elements is a lossless candidate
    filter (property-tested against brute force in
    ``tests/test_prefix_filter_properties.py``).  The exact verify
    join runs only on candidate pairs.

    Plan shape: the element relation is ``localCheckpoint``-ed — five
    consumers (ranking, both candidate sides, both verify sides) share
    one computation; document frequency and set size come from window
    counts over the stream's own two shuffles (by element, then by
    doc) instead of separate groupBy+join round trips.
    """
    from pyspark.sql import Window

    sh = stage_table(sh, label="prefix_elems")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # total-order: sh is one row per (doc_id, shingle) — distinct
    # shingles — so the trailing shingle is unique within the partition
    w_doc = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (
        sh.withColumn("df", F.count("*").over(Window.partitionBy("shingle")))
        .withColumn("pos", F.row_number().over(w_doc))
        .withColumn("n_sh",
                    F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("n_sh")
        - F.ceil(threshold * F.col("n_sh")) + 1
    ).select("doc_id", "shingle")
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "shingle"),
              "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("b_id"),
                     F.col("shingle").alias("shingle_b"))
    common = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, (F.col("doc_b") == F.col("b_id"))
              & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    )
    j = (
        common
        .join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}),
              "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}),
              "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 4))
    )
    return (j.filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))
