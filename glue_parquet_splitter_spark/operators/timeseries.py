"""Scale-safe time-series smoothing operators.

``ewma_user_value`` (queries/timeseries2_q.py) rewrites the EWMA
recursion as a ratio of running sums with weights ``(1-α)^(-rn)`` —
exact and oracle-replayable, but the weight overflows float64 once
``rn · (-ln(1-α)) > 709`` (α=0.1 → ~6,700 events per key).  This module
is the unbounded-history form that the query's docstring promises:
block re-based exponents, finite for any history length.

Derivation (adjust=True EWMA, ``s_n = Σ (1-α)^(n-k) x_k / Σ (1-α)^(n-k)``):
split each key's ordered history into fixed blocks of ``B`` rows.  Pick
``B`` so that ``(1-α)^B ≤ e^-40 ≈ 4e-18`` — anything older than one full
block contributes below one float64 ulp, so

    s_n  ≈  [ (1-α)^j · C_num(prev block) + L_num(j) ]
          / [ (1-α)^j · C_den(prev block) + L_den(j) ]

where ``j`` is the in-block row index, ``L`` are block-LOCAL weighted
prefix sums (exponents bounded by ``B``: max weight ``e^40 ≈ 2.4e17``,
far from overflow), and ``C`` is the previous block's full weighted sum
(same bounded exponents).  No recursion crosses more than one block
boundary, so the whole thing is: one row_number window, one in-block
prefix window, one per-block aggregate, one self-join on
``(key, block+1)`` — all partitioned by key, no driver state, no UDF.

Truncation error is relative ``≤ (1-α)^B ≤ 4e-18`` — below double
precision, i.e. bit-comparable to the exact form wherever the exact
form doesn't overflow (property-tested against pandas ``ewm`` in
``tests/test_ewma_rebase.py``, including a 10⁵-event key).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rebase_block_size(alpha: float, ulp_margin: float = 40.0) -> int:
    """Smallest block size whose cross-block truncation is < float64 ulp.

    ``(1-α)^B = e^(-B·(-ln(1-α))) ≤ e^(-ulp_margin)`` → ``B ≥
    ulp_margin / (-ln(1-α))``.  The in-block weight ``(1-α)^(-B)`` is
    then ``e^(ulp_margin) ≈ 2.4e17`` — bounded regardless of α.
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return max(2, math.ceil(ulp_margin / -math.log1p(-alpha)))


def ewma(df: DataFrame, key_cols: list[str], order_cols: list[str],
         value_col: str | Column, alpha: float,
         out_col: str = "ewma") -> DataFrame:
    """Per-key EWMA (pandas ``adjust=True`` semantics) at every row,
    finite for unbounded per-key histories.

    Returns ``df``'s key/order columns plus ``rn`` (1-based per-key row
    number) and ``out_col``.  One shuffle on the key (reused by every
    window), one per-block aggregate, one join on ``(key, block)``.
    """
    B = rebase_block_size(alpha)
    q = F.lit(1.0 - alpha)
    # total-order: caller contract — order_cols must be a TOTAL order
    # within key_cols; the registered callers pass (ts, event_id) over
    # the identity-deduped events table (operators.events.unique_events
    # applied upstream), so ties cannot survive to the pick
    rn = F.row_number().over(
        Window.partitionBy(*key_cols).orderBy(*order_cols))
    rows = df.select(
        *key_cols, *order_cols,
        F.col(value_col).cast("double").alias("__x") if isinstance(value_col, str)
        else value_col.cast("double").alias("__x"),
    ).withColumn("rn", rn).withColumns({
        "__block": ((F.col("rn") - 1) / B).cast("long"),
        "__j": ((F.col("rn") - 1) % B + 1).cast("long"),
    })

    # block-local weighted prefix sums: exponents bounded by B
    # total-order: __j = (rn-1) % B + 1 is unique within (key, __block)
    # by construction from the per-key row number
    wloc = (Window.partitionBy(*key_cols, "__block").orderBy("__j")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    inv = F.pow(q, -F.col("__j"))
    rows = rows.withColumns({
        "__lnum": F.pow(q, F.col("__j")) * F.sum(inv * F.col("__x")).over(wloc),
        "__lden": F.pow(q, F.col("__j")) * F.sum(inv).over(wloc),
    })

    # previous block's full weighted sums C = Σ (1-α)^(B_prev - i) · x_i;
    # B_prev is the actual block length (== B except for a last short block,
    # which never feeds a carry — it has no successor)
    carries = rows.groupBy(*key_cols, "__block").agg(
        (F.pow(q, B) * F.sum(F.pow(q, -F.col("__j")) * F.col("__x")))
        .alias("__cnum"),
        (F.pow(q, B) * F.sum(F.pow(q, -F.col("__j")))).alias("__cden"),
    ).withColumn("__block", F.col("__block") + 1)

    joined = rows.join(carries, on=[*key_cols, "__block"], how="left")
    num = F.col("__lnum") + F.pow(q, F.col("__j")) * F.coalesce(
        F.col("__cnum"), F.lit(0.0))
    den = F.col("__lden") + F.pow(q, F.col("__j")) * F.coalesce(
        F.col("__cden"), F.lit(0.0))
    return joined.select(
        *key_cols, *order_cols, "rn", (num / den).alias(out_col))


def asof_backward(left: DataFrame, right: DataFrame, on: str,
                  by: list[str], values: list[str]) -> DataFrame:
    """Generic backward as-of join: every ``left`` row picks up the
    ``values`` columns from the most recent ``right`` row with
    ``right.on <= left.on`` within the same ``by`` key (inclusive
    bound; right rows sort before left rows at equal timestamps).

    Composition (Spark has no native ASOF): tag both sides, union,
    and take the running last-non-null of each value column per key in
    time order — ONE shuffle on the key, zero row explosion.  The
    inequality-join + top-1 alternative materializes |left| × (all
    earlier right rows of the key) before pruning, which explodes on
    long histories.  ``right`` must be unique per (by, on) — pre-
    aggregate it (as ``asof_join`` does per (cust, day)); with
    duplicates the pick among equal timestamps is nondeterministic.

    Left rows with no earlier right row keep NULL values (the caller
    filters or fills) — pandas ``merge_asof`` semantics, property-
    tested against it in ``tests/test_asof_properties.py``.
    """
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    payload = [c for c in left.columns if c not in by and c != on]
    right_u = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_l"),
        *values,
        *[F.lit(None).cast(ldt[c]).alias(c) for c in payload],
    )
    left_u = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.lit(None).cast(rdt[v]).alias(v) for v in values],
        *payload,
    )
    # total-order: caller contract — right must be unique per (by, on)
    # (the registered asof queries pre-aggregate the right side); tied
    # LEFT rows are harmless: they carry NULL values, which the
    # ignorenulls fill skips, so every tied row receives the same fill
    w = (Window.partitionBy(*by).orderBy("__t", "__is_l")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = right_u.unionByName(left_u).select(
        *by,
        F.col("__t").alias(on),
        "__is_l",
        *payload,
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
    )
    return filled.filter(F.col("__is_l") == 1).drop("__is_l")


def asof_forward(left: DataFrame, right: DataFrame, on: str,
                 by: list[str], values: list[str]) -> DataFrame:
    """Forward as-of: every ``left`` row picks up ``values`` from the
    EARLIEST ``right`` row with ``right.on >= left.on`` in the ``by``
    key (inclusive).  Same union+running-fill composition as
    :func:`asof_backward` with the window run in DESCENDING time order
    (right rows still tie-break before left rows at equal timestamps).
    A tolerance bound ("within the next 7 days") is a NULL-out
    projection on the caller's side — see
    ``queries.advanced_q.asof_join_forward_tolerance``."""
    ldt, rdt = dict(left.dtypes), dict(right.dtypes)
    payload = [c for c in left.columns if c not in by and c != on]
    right_u = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_l"),
        *values,
        *[F.lit(None).cast(ldt[c]).alias(c) for c in payload],
    )
    left_u = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.lit(None).cast(rdt[v]).alias(v) for v in values],
        *payload,
    )
    # total-order: same caller contract as asof_backward above — right
    # unique per (by, on); tied left rows receive identical fills
    w = (Window.partitionBy(*by).orderBy(F.desc("__t"), F.asc("__is_l"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = right_u.unionByName(left_u).select(
        *by,
        F.col("__t").alias(on),
        "__is_l",
        *payload,
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
    )
    return filled.filter(F.col("__is_l") == 1).drop("__is_l")
