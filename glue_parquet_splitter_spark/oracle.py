"""Local replica of the verification driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and order-insensitive values — the
same contract CORRECTNESS_r{N}.json grades, so failures surface here
before the driver sees them.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from .catalog import TABLES


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            if math.isinf(v):          # int(inf) would overflow (seen
                return repr(v)         # in the --nan fuzz sweep)
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    sp = (spark_df if isinstance(spark_df, pd.DataFrame)
          else spark_df.toPandas())
    if len(sp) != len(oracle_df):
        return False, f"row count {len(sp)} vs oracle {len(oracle_df)}"
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, oracle_df.columns)):
        return False, f"columns {sorted(sp.columns)} vs oracle {sorted(oracle_df.columns)}"
    # align oracle column case to Spark's BEFORE canonical sorting —
    # sorting case-sensitive names independently could pair up wrong
    # columns when cases differ
    case_map = {c.lower(): c for c in sp.columns}
    oracle_df = oracle_df.rename(columns={c: case_map[c.lower()] for c in oracle_df.columns})
    if len(sp) == 0:
        # Zero rows on both sides (counts matched above): the value
        # contract is vacuous and .equals() false-alarms on
        # engine-native empty dtypes (seen as "0/0 rows differ" in the
        # --empty fuzz sweep) — but the TYPE contract is not vacuous:
        # a query returning the right names with wrong dtypes on the
        # empty path must still fail.  Compare a normalized kind per
        # column, with object dtype as a wildcard (either engine may
        # degrade an empty column to object, e.g. DuckDB BIGINT → the
        # pandas object dtype on zero rows).
        for c in sp.columns:
            ka, kb = sp[c].dtype.kind, oracle_df[c].dtype.kind
            if "O" in (ka, kb):
                continue  # empty-frame wildcard
            # numeric kinds collapse (int-vs-float on zero rows hashes
            # identically — there are no values to hash)
            norm = lambda k: "n" if k in "fiu" else k
            if norm(ka) != norm(kb):
                return False, (
                    f"empty-path type-kind mismatch on column {c!r}: "
                    f"spark dtype {sp[c].dtype} vs oracle {oracle_df[c].dtype}"
                )
        return True, "ok (both empty)"
    # Type-kind check BEFORE canonicalization: the driver's hash is
    # type-sensitive (5.0 vs 5 differ), while _canon collapses integral
    # floats — so an int/float divergence (e.g. DuckDB FLOOR→DOUBLE vs
    # Spark floor→LONG) must fail here too. Columns with nulls are
    # exempt: pandas upcasts nullable ints to float64 on either side.
    for c in sp.columns:
        ka, kb = sp[c].dtype.kind, oracle_df[c].dtype.kind
        if {ka, kb} <= {"f", "i", "u"} and ("f" in (ka, kb)) != (ka == kb == "f"):
            if not (sp[c].isna().any() or oracle_df[c].isna().any()):
                return False, (
                    f"type-kind mismatch on column {c!r}: spark dtype "
                    f"{sp[c].dtype} vs oracle {oracle_df[c].dtype} "
                    "(int vs float — driver hash would fail)"
                )
    a, b = _canon(sp), _canon(oracle_df)
    if a.equals(b):
        return True, "ok"
    diff = (a != b)
    bad = diff.any(axis=1)
    n_bad = int(bad.sum())
    sample = ""
    if n_bad:
        i = bad.idxmax()
        sample = f" first diff row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}"
    return False, f"{n_bad}/{len(a)} rows differ.{sample}"


def run_one(spark, sf_dir: str, name: str,
            rows_out: dict | None = None) -> tuple[bool, str]:
    """Run one registered query against its oracle.  When the caller
    passes ``rows_out``, the Spark-side row count is recorded there
    (``rows_out[name] = n``) — the fuzz harness uses this to commit
    per-regime row counts into its ledgers, turning "PASS with zero
    rows on every fixture" from invisible into lintable
    (VERDICT r13 #3)."""
    from .queries import load_all_modules

    reg = load_all_modules()
    spec = reg[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        n = sdf.count()
        if rows_out is not None:
            rows_out[name] = n
        return True, f"rows-only: {n} rows"
    con = duckdb_connection(sf_dir)
    odf = con.sql(spec.oracle).df()
    sp = sdf.toPandas()
    if rows_out is not None:
        rows_out[name] = len(sp)
    return compare(sp, odf)
