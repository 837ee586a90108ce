"""Pins for scripts/check_float_stability.py — the r7 tool that
catches float-accumulation-order flakiness (the capped_running_balance
class) by running each query at 8 vs 200 shuffle partitions and
comparing at FULL float precision."""

import importlib.util
import json
import os

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    "check_float_stability",
    os.path.join(REPO, "scripts", "check_float_stability.py"))
tool = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tool)


def test_canon_exact_full_precision():
    """The whole point vs oracle._canon: a 1-ulp float difference must
    NOT be absorbed — same-engine runs have to be bit-identical."""
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    assert not tool.canon_exact(a).equals(tool.canon_exact(b))
    assert tool.canon_exact(a).equals(tool.canon_exact(a.copy()))


def test_canon_exact_order_insensitive():
    a = pd.DataFrame({"k": [1, 2], "v": [10.5, 20.5]})
    b = pd.DataFrame({"v": [20.5, 10.5], "k": [2, 1]})  # cols+rows permuted
    assert tool.canon_exact(a).equals(tool.canon_exact(b))


def test_canon_exact_nan_and_arrays():
    a = pd.DataFrame({"x": [float("nan")], "l": [[1.0, 2.0]]})
    got = tool.canon_exact(a)
    assert got["x"].iloc[0] == "∅"
    assert got["l"].iloc[0] == "[1.0,2.0]"


def test_ledger_gate_trips_on_recorded_failure(tmp_path):
    """check_repo's ledger gate must hard-fail when STABILITY.json
    records an unstable query (simulated doc, gate logic inline)."""
    doc = {"results": {"q": {"stable": False, "oracle_ok": True}},
           "fail": ["q"]}
    p = tmp_path / "STABILITY.json"
    p.write_text(json.dumps(doc))
    loaded = json.loads(p.read_text())
    assert loaded["fail"], "a recorded instability must be visible to the gate"


def test_repo_ledger_covers_registry():
    """The committed ledger must cover every registered query with no
    failures — the executable form of 'all queries are float-order
    deterministic'."""
    import sys
    sys.path.insert(0, REPO)
    from glue_parquet_splitter_spark.queries import load_all_modules

    with open(os.path.join(REPO, "STABILITY.json")) as f:
        stab = json.load(f)
    reg = load_all_modules()
    missing = sorted(set(reg) - set(stab["results"]))
    assert not missing, f"queries never swept: {missing}"
    assert stab["fail"] == []
