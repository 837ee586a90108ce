"""Perceptual-hash image dedup (VERDICT r10 #3): planted near-dup
twins — re-encoded (header comment) and brightness-shifted copies of
the same pixel plane — must land in the same dHash bucket and verify
at Hamming <= 3 (the 4-band pigeonhole-complete range, ADVICE r11),
while an unrelated image must not pair with them."""

import pyspark.sql.functions as F
import pytest

from glue_parquet_splitter_spark.operators import multimodal as M

pytestmark = pytest.mark.usefixtures("spark")


def _ppm(w: int, h: int, plane: bytes, comment: str = "") -> bytes:
    assert len(plane) == w * h * 3
    c = f"#{comment}\n".encode() if comment else b""
    return b"P6\n" + c + f"{w} {h}\n255\n".encode() + plane


def _hashes(spark, payloads: dict[int, bytes]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads.items()],
        "doc_id long, payload binary")
    return {r["doc_id"]: (r["h_lo"], r["h_hi"])
            for r in M.dhash_ppm(df).collect()}


def test_planted_twins_hash_identically(spark):
    # gradient-rich base plane: bytes in 90..119, strictly below the
    # pad byte 'x' (120) so a +1 brightness shift cannot flip any
    # text-vs-pad comparison either
    w, h = 12, 9
    plane = bytes((90 + (i * 7) % 30) for i in range(w * h * 3))
    shifted = bytes(b + 1 for b in plane)          # brightness +1
    hs = _hashes(spark, {
        1: _ppm(w, h, plane),
        2: _ppm(w, h, plane, comment="re-encoded"),   # re-encode twin
        3: _ppm(w, h, shifted),                       # brightness twin
        4: _ppm(w, h, bytes(255 - b for b in plane)),  # inverted: far
    })
    assert hs[1] == hs[2], "header re-encode must not change the hash"
    assert hs[1] == hs[3], "constant brightness shift must not change it"

    def ham(a, b):
        return (bin(a[0] ^ b[0]) + bin(a[1] ^ b[1])).count("1")

    assert ham(hs[1], hs[4]) > 6, "inverted plane must be far"


def test_banded_query_catches_planted_pairs(spark, sf_dir, tmp_path):
    """End-to-end through the registered query on a corpus where docs
    7001/7002 share text (same image) and 7003 is a one-char
    brightness-shifted twin (same dHash, near-dup by construction)."""
    import shutil

    from glue_parquet_splitter_spark.catalog import TABLES, load_table
    from glue_parquet_splitter_spark.queries import load_all_modules

    out = tmp_path / "fixtures"
    out.mkdir()
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{sf_dir}/{t}.parquet", out / f"{t}.parquet")
    base = "b c d e f g h i j k l m n o p q r s t u v w a b c d e f g"
    shifted = "".join(chr(ord(c) + 1) if c != " " else " " for c in base)
    docs = load_table(spark, sf_dir, "documents").limit(20).unionByName(
        spark.createDataFrame(
            [(7001, base, "en", "src0", len(base)),
             (7002, base, "en", "src0", len(base)),
             (7003, shifted, "en", "src0", len(shifted))],
            "doc_id long, text string, lang string, source string, "
            "n_chars long"))
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(out / "documents.parquet"))
    reg = load_all_modules()
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in reg["phash_image_dedup"].fn(spark, str(out)).collect()}
    assert pairs.get((7001, 7002)) == 0      # identical image
    assert pairs.get((7001, 7003)) == 0      # brightness twin, same hash
    assert pairs.get((7002, 7003)) == 0


def test_phash_plan_is_banded_join_not_allpairs(spark, sf_dir):
    """Plan pin (VERDICT r10 #3): candidates come from the banded
    (band_idx, band_val) equi-join — never a cartesian/nested-loop
    all-pairs — and the per-bucket cap window is PARTITIONED."""
    from glue_parquet_splitter_spark.plans import physical_plan
    from glue_parquet_splitter_spark.queries import load_all_modules

    reg = load_all_modules()
    plan = physical_plan(reg["phash_image_dedup"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_idx" in plan and "band_val" in plan
    assert "SinglePartition" not in plan
