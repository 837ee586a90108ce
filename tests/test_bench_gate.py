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
    assert prev, "expected per-query shuffle bytes from the parsed doc"
    assert all(isinstance(v, int) for v in prev.values())
    # driver files nest under "parsed" — verify we unwrapped it
    with open(os.path.join(REPO, name)) as f:
        doc = json.load(f)
    inner = doc.get("parsed", doc)
    assert prev == {k: int(v) for k, v in
                    inner["shuffle_bytes_written"].items()}


def test_bench_queries_exist_in_registry():
    """A typo'd or renamed bench entry should fail here, not 40 s into
    the driver's bench run."""
    from glue_parquet_splitter_spark.queries import load_all_modules

    reg = load_all_modules()
    missing = [n for n in bench.BENCH_QUERIES if n not in reg]
    assert not missing, missing
