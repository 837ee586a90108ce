"""The bench harness's shuffle-bytes regression gate (VERDICT r5 #3):
shuffle volume is plan-determined, so a ±20 % round-over-round move is
a plan change — the gate must trip on a planted regression and stay
quiet on noise-level moves and tiny shuffles."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def test_planted_regression_trips():
    prev = {"q": 100_000, "tiny": 500, "stable": 50_000}
    cur = {"q": 150_000, "tiny": 5_000, "stable": 52_000, "new": 99_999}
    regs = bench.shuffle_regressions(prev, cur)
    # q grew 1.5x -> tripped with the delta recorded
    assert regs == {"q": {"prev": 100_000, "cur": 150_000, "ratio": 1.5}}


def test_shrink_also_trips():
    # a big shrink is ALSO a plan change worth flagging (e.g. a query
    # silently returning fewer rows) — the gate is two-sided
    regs = bench.shuffle_regressions({"q": 100_000}, {"q": 50_000})
    assert regs["q"]["ratio"] == 0.5


def test_quiet_on_noise_and_errors():
    prev = {"q": 100_000, "small": 500}
    # -1 marks a best-effort metrics failure; small prev is below floor
    cur = {"q": 110_000, "small": 50_000, "failed": -1}
    assert bench.shuffle_regressions(prev, cur) == {}


def test_reads_latest_committed_round():
    name, prev = bench.load_prev_shuffle_bytes(REPO)
    # the repo always carries at least one driver-written BENCH file
    assert name is not None and name.startswith("BENCH_r")
    assert prev, "expected per-query shuffle bytes recovered from some round"
    assert all(isinstance(v, int) for v in prev.values())
    assert any(v > bench.SHUFFLE_GATE_MIN_BYTES for v in prev.values())


def test_recovers_from_parsed_null_truncated_tail():
    """VERDICT r6 #2: driver-written BENCH_r06.json has "parsed": null
    and a front-truncated tail — the shuffle block near the line's end
    must still be recovered (it disarmed the r7 gate otherwise)."""
    doc = {"parsed": None,
           "tail": ('...": 0.4}, "shuffle_bytes_written": {"q1": 10000, '
                    '"q2": 55085}, "shuffle_baseline": "BENCH_r05.json"}')}
    assert bench._shuffle_bytes_from_doc(doc) == {"q1": 10000, "q2": 55085}


def test_reads_compact_shuffle_kb_form():
    """r7+ prints shuffle bytes as a kB list aligned with the queries
    key order, so the line fits the driver's 2000-char tail capture."""
    doc = {"parsed": {"queries": {"a": 1.0, "b": 2.0, "stream_c": 3.0},
                      "shuffle_kb": [9.8, 53.8, None]}}
    got = bench._shuffle_bytes_from_doc(doc)
    assert got == {"a": int(9.8 * 1024), "b": int(53.8 * 1024)}
    # and the tail-regex path for the same form
    doc2 = {"parsed": None,
            "tail": ('"queries":{"a":1.0,"b":2.0,"c":3.0},"sf":0.1,'
                     '"shuffle_kb":[9.8,53.8,null],"loadavg":[1]}')}
    got2 = bench._shuffle_bytes_from_doc(doc2)
    assert got2 == {"a": int(9.8 * 1024), "b": int(53.8 * 1024)}


def test_falls_back_to_older_parseable_round(tmp_path):
    """A newest round with nothing recoverable must not silently yield
    {} while an older round has real bytes."""
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"parsed": None, "tail": "garbage no shuffle block"}))
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"parsed": {"shuffle_bytes_written": {"q": 123456}}}))
    name, prev = bench.load_prev_shuffle_bytes(str(tmp_path))
    assert name == "BENCH_r08.json"
    assert prev == {"q": 123456}


def test_bench_queries_exist_in_registry():
    """A typo'd or renamed bench entry should fail here, not 40 s into
    the driver's bench run."""
    from glue_parquet_splitter_spark.queries import load_all_modules

    reg = load_all_modules()
    missing = [n for n in bench.BENCH_QUERIES if n not in reg]
    assert not missing, missing
