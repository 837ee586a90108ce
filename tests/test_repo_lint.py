"""The broadcast-boundedness lint (scripts/check_repo.py check 4c,
VERDICT r8 #3) — the repo must pass, and a seeded violation must fail.

An explicit F.broadcast() hint bypasses autoBroadcastJoinThreshold, so a
hint on a data-dependent side (a dedup drop set, a per-user size table)
turns a graceful shuffle-join degradation into an executor OOM at
100 TB.  The lint requires every call site to carry a boundedness
proof: a global .agg() scalar, a .limit(k), a region|nation fixture
dim, or a `# bounded: <cardinality argument>` comment.
"""

import sys
import textwrap

sys.path.insert(0, "/root/repo/scripts")

from check_repo import scan_broadcast_sites  # noqa: E402


def test_repo_has_no_unjustified_broadcasts():
    hits = scan_broadcast_sites("/root/repo/glue_parquet_splitter_spark")
    assert hits == [], "unjustified F.broadcast sites:\n" + "\n".join(hits)


def test_seeded_violation_fails(tmp_path):
    (tmp_path / "bad_q.py").write_text(textwrap.dedent("""\
        from pyspark.sql import functions as F

        def apply_dedup(corpus, removed):
            return corpus.join(F.broadcast(removed), "doc_id", "left_anti")
    """))
    hits = scan_broadcast_sites(str(tmp_path))
    assert len(hits) == 1 and "bad_q.py:4" in hits[0], hits


def test_seeded_violation_passes_with_bounded_comment(tmp_path):
    (tmp_path / "ok_q.py").write_text(textwrap.dedent("""\
        from pyspark.sql import functions as F

        def enrich(fact, dim):
            # bounded: dim is a 7-row day-of-week table
            return fact.join(F.broadcast(dim), "dow")
    """))
    assert scan_broadcast_sites(str(tmp_path)) == []


def test_auto_proofs_pass(tmp_path):
    (tmp_path / "auto_q.py").write_text(textwrap.dedent("""\
        from pyspark.sql import functions as F

        def shapes(fact, load_table, spark, sf_dir):
            total = fact.agg(F.sum("x").alias("t"))
            top = fact.orderBy("x").limit(10)
            n = load_table(spark, sf_dir, "nation")
            g = fact.groupBy().agg(F.count("*").alias("n"))
            a = fact.crossJoin(F.broadcast(total))
            b = fact.join(F.broadcast(top), "k")
            c = fact.join(F.broadcast(n), "nk")
            d = fact.crossJoin(F.broadcast(g))
            return a, b, c, d
    """))
    assert scan_broadcast_sites(str(tmp_path)) == []


def test_groupby_agg_is_not_an_auto_proof(tmp_path):
    # a groupBy(key) aggregate is O(|key domain|) — data-dependent, so
    # it must NOT auto-pass without a comment
    (tmp_path / "gb_q.py").write_text(textwrap.dedent("""\
        from pyspark.sql import functions as F

        def sizes_join(fact):
            sizes = fact.groupBy("user_id").agg(F.count("*").alias("n"))
            return fact.join(F.broadcast(sizes), "user_id")
    """))
    hits = scan_broadcast_sites(str(tmp_path))
    assert len(hits) == 1, hits
