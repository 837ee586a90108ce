"""Registry rotation: the driver grades a capped prefix of ``queries()``,
so ordering must put not-yet-verified queries first (oracled before
rows-only) and already-green ones last."""

import json

from glue_parquet_splitter_spark.queries import load_all_modules, ordered_registry


def test_rotation_prioritizes_unverified(tmp_path):
    reg = load_all_modules()
    names = list(reg)
    # fake a driver file: first 10 registry queries green, one rows-only checked
    rows_only = [n for n in names if reg[n].oracle is None]
    fake = {n: {"hash_match": True, "err": None, "spark_rows": 1} for n in names[:10]}
    fake[rows_only[0]] = {"hash_match": None, "err": "no_oracle", "spark_rows": 3}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(fake))

    ordered = list(ordered_registry(str(tmp_path)))
    assert len(ordered) == len(names)
    green = set(list(fake))
    n_unverified = len(names) - len(green)
    # every green query sits after every unverified one
    assert all(n in green for n in ordered[n_unverified:])
    assert not any(n in green for n in ordered[:n_unverified])
    # oracled unverified before rows-only unverified
    first_rows_only = next(i for i, n in enumerate(ordered) if reg[n].oracle is None)
    assert all(reg[n].oracle is not None for n in ordered[:first_rows_only])


def test_rotation_no_files_is_registry_order(tmp_path):
    assert list(ordered_registry(str(tmp_path))) != []
    reg = load_all_modules()
    # with no correctness files every query is "unverified": oracled keep
    # registry order, rows-only move to the back
    ordered = list(ordered_registry(str(tmp_path)))
    oracled = [n for n in reg if reg[n].oracle is not None]
    rows_only = [n for n in reg if reg[n].oracle is None]
    assert ordered == oracled + rows_only
