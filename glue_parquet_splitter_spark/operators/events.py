"""Identity-uniqueness ingest contract for the events table.

The third table-level identity contract after embeddings
(``similarity.finite_vectors`` shape (f)) and documents
(``text.unique_documents``), forced by the same hostility: a
double-delivered CDC batch / reprocessed partition lands the same
``event_id`` twice, sometimes byte-identical and sometimes CONFLICTING
(mutated ``value`` / ``event_type``).  Every window that orders by
``(ts, event_id)`` treats event_id as the identity tiebreak; a
duplicate identity makes that order NON-TOTAL, so any pick routed
through it (``lag(event_type)`` change detection, ``row_number``
contribution caps, LOCF carried values, EWMA prefix paths) becomes
run-nondeterministic — the luck-dependent-pass class the r14 seed
sweep exposed (``FUZZ.md``).

Winner rule: one row per ``event_id``, minimum by
``(ts, user_id, value, event_type, props)``, each ASC NULLS LAST.
``value`` deliberately sorts BEFORE ``event_type``: the streaming
quota sampler's O(K) state carries only ``(ts_us, event_id, value)``,
so its in-state winner rule can only discriminate on value — putting
value first makes the batch contract and the stream state pick the
SAME winner (both resolve byte-identical copies trivially, and every
conflicting mutation the fuzz injects INCREASES the mutated column,
so the original row wins under either rule).  NaN value sorts after
all numbers and before NULL on both engines.

Stream-state alignment (ADVICE r14, revised r15): the quota sampler's
state dedups per ``event_id`` alone WITHIN its user group — i.e. per
``(user_id, event_id)`` — min by ``(ts_us, value)``, the projection
of this contract's order key onto the columns the O(K) state carries,
so a duplicate event_id redelivered at a DIFFERENT ts collapses to
the same single winner on both sides.  A duplicate event_id SPANNING
``user_id`` values (the ``--dupkeys`` × ``--nullkeys`` interaction:
one copy's user_id nulled — found by the seed-15 roll) lands in two
independent state groups, and each user's quota deliberately counts
its own copy: per-user quota semantics, mirrored by the sampler
oracle's ``PARTITION BY user_id, event_id`` dedup instead of this
table-wide contract.  Cross-user identity dedup remains the
bronze→silver boundary's job (this contract; ``pk_uniqueness_audit``
is the detector).

Scale: one event_id-keyed window — production pipelines dedup once at
the bronze→silver boundary and skip this pass; like the other two
contracts it is a no-op (beyond the shuffle) on an identity-clean
corpus.  ``pk_uniqueness_audit`` is the detector that reports the
duplicate mass this contract would silently resolve.  Only
identity-SCOPED queries take the contract; multiplicity-transparent
aggregations keep raw reads on both engines (the r13 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EVENT_ORDER = ("ts", "user_id", "value", "event_type", "props")


def unique_events(events: DataFrame) -> DataFrame:
    """One deterministic winner row per ``event_id`` (see module
    docstring for the rule and why value precedes event_type)."""
    # total-order: orders by every non-pk column of the table —
    # residual ties are byte-identical rows; any winner is the same row
    w = Window.partitionBy("event_id").orderBy(
        *[F.asc_nulls_last(c) for c in _EVENT_ORDER])
    return (events.withColumn("_uq_rn", F.row_number().over(w))
            .filter(F.col("_uq_rn") == 1).drop("_uq_rn"))


def wf_events_sql(table: str = "events") -> str:
    """DuckDB mirror of :func:`unique_events`, usable as a CTE body."""
    order = ", ".join(f"{c} ASC NULLS LAST" for c in _EVENT_ORDER)
    return (f"SELECT * EXCLUDE (_uq_rn) FROM ("
            f"SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id"
            f" ORDER BY {order}) AS _uq_rn"
            f" FROM {table}) WHERE _uq_rn = 1")
