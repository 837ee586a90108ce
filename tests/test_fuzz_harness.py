"""The adversarial-fixture harness (scripts/fuzz_oracle.py) must stay
schema-compatible with the driver fixtures — a drifted column type
would make every fuzz failure noise — and its hostile content must
actually be hostile (nulls, unicode, ties, dangling FKs present)."""

import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo/scripts")

from fuzz_oracle import classify_exception, gen_fixtures  # noqa: E402

from glue_parquet_splitter_spark.catalog import TABLES  # noqa: E402


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_fixtures")
    gen_fixtures(str(d), seed=0)
    return str(d)


def test_schemas_match_driver_fixtures(fuzz_dir, sf_dir):
    for t in TABLES:
        ref = pq.read_schema(f"{sf_dir}/{t}.parquet")
        got = pq.read_schema(f"{fuzz_dir}/{t}.parquet")
        assert got.names == ref.names, t
        for name in ref.names:
            assert str(got.field(name).type) == str(ref.field(name).type), \
                f"{t}.{name}: {got.field(name).type} vs {ref.field(name).type}"


def test_hostilities_present(fuzz_dir):
    import duckdb

    con = duckdb.connect()
    q = lambda s: con.sql(  # noqa: E731
        s.replace("@", f"'{fuzz_dir}/")).fetchone()[0]
    assert q("SELECT COUNT(*) FROM read_parquet(@documents.parquet') "
             "WHERE text IS NULL") > 0
    assert q("SELECT COUNT(*) FROM read_parquet(@documents.parquet') "
             "WHERE text = ''") > 0
    assert q("SELECT COUNT(*) FROM read_parquet(@documents.parquet') "
             "WHERE octet_length(encode(text)) > length(text)") > 0  # unicode
    # heavy event-timestamp ties
    assert q("SELECT COUNT(DISTINCT ts) FROM "
             "read_parquet(@events.parquet')") <= 10
    # dangling order FK
    assert q("SELECT COUNT(*) FROM read_parquet(@orders.parquet') o "
             "WHERE NOT EXISTS (SELECT 1 FROM "
             "read_parquet(@customer.parquet') c "
             "WHERE c.c_custkey = o.o_custkey)") > 0
    # zero + duplicate embeddings
    assert q("SELECT COUNT(*) FROM read_parquet(@embeddings.parquet') "
             "WHERE list_sum(list_transform(embedding, x -> abs(x))) = 0"
             ) >= 5
    # mega-order skew
    assert q("SELECT MAX(c) FROM (SELECT COUNT(*) AS c FROM "
             "read_parquet(@lineitem.parquet') GROUP BY l_orderkey)") >= 300


def test_generation_is_seed_deterministic(tmp_path):
    import hashlib

    import duckdb

    def digest(d):
        gen_fixtures(str(d), seed=3)
        con = duckdb.connect()
        h = hashlib.md5()
        for t in sorted(TABLES):
            rows = con.sql(
                f"SELECT * FROM read_parquet('{d}/{t}.parquet')").fetchall()
            h.update(repr(rows).encode())
        return h.hexdigest()

    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    assert digest(a) == digest(b)


def test_guard_classification():
    assert classify_exception(
        ValueError("pack_wav: non-ASCII text for doc_id=7")) == "GUARD"
    assert classify_exception(ValueError("boom")) == "FAIL"


def test_query_vs_oracle_on_hostile_data(spark, fuzz_dir):
    from glue_parquet_splitter_spark.oracle import run_one

    for name in ("filter_project", "agg_stats", "null_handling"):
        ok, msg = run_one(spark, fuzz_dir, name)
        assert ok, f"{name}: {msg}"
