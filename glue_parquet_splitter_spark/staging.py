"""Cluster-safe lineage cuts for reused intermediates (VERDICT r15 #1).

Several query paths compute a table that feeds MULTIPLE consumers in
one plan (a classifier feature table read by both weight training and
inference; a tokenizer word table read by every EM round; a multimodal
fingerprint table read by every dedup consumer).  Left as lineage, the
subtree re-executes once per consumer; the r15 optimization round cut
those sites with ``DataFrame.localCheckpoint(eager=False)``.

``localCheckpoint`` is the right primitive ONLY in local mode: it pins
blocks to executor storage with NO fault tolerance, so on a real
cluster one lost executor fails the job instead of recomputing lineage
(optimization guide §5).  This module keeps the local-mode behavior
bit-for-bit (plans still show ``Scan ExistingRDD``) and substitutes a
durable cut on cluster masters:

- **local[*] master** → ``localCheckpoint(eager=False)`` — instance-
  scoped, recomputed per invocation (never ``.cache()``: the cache
  manager plan-matches across invocations, which would be cross-run
  reuse).
- **cluster + ``SPARK_GRAFT_STAGE_DIR``** → the table is written once
  as parquet under a unique subdirectory and read back — the "land the
  word table as a parquet stage" form the production pipeline uses
  (restartable, auditable, reusable by other jobs).
- **cluster + a Spark checkpoint dir** (``sc.setCheckpointDir``) →
  ``DataFrame.checkpoint(eager=False)`` — a reliable checkpoint whose
  blocks live on the fault-tolerant checkpoint filesystem.
- **cluster with neither configured** → the lineage is left UNCUT (the
  subtree recomputes per consumer, exactly the pre-r15 plan): slower,
  but correct and fault-tolerant, and a one-time warning names the two
  knobs that restore the cut.  Iterative callers (connected-components
  rounds, EM/BPE training loops) pass ``must_cut=True`` because an
  uncut loop grows the plan without bound — they fall back to
  ``localCheckpoint`` rather than not cutting at all.
"""

from __future__ import annotations

import os
import sys
import uuid

from pyspark.sql import DataFrame

STAGE_DIR_ENV = "SPARK_GRAFT_STAGE_DIR"

_WARNED = False


def _stage_mode(master: str | None, stage_dir: str | None,
                checkpoint_dir: str | None) -> str:
    """Pure decision kernel (unit-tested without a cluster): which cut
    applies for this (master, stage-dir, checkpoint-dir) triple."""
    if master is None or master.startswith("local"):
        return "local"
    if stage_dir:
        return "parquet"
    if checkpoint_dir:
        return "reliable"
    return "uncut"


def stage_table(df: DataFrame, label: str = "stage",
                eager: bool = False, must_cut: bool = False) -> DataFrame:
    """Cut ``df``'s lineage so multi-consumer plans execute it once.

    Local masters keep the r15 ``localCheckpoint(eager=False)`` form
    (same plans, same bench semantics); cluster masters get a durable
    stage (parquet under ``$SPARK_GRAFT_STAGE_DIR``, else a reliable
    checkpoint, else no cut + warning).  ``label`` names the parquet
    subdirectory for auditability.  ``must_cut=True`` (iterative
    callers whose plan grows without bound when uncut) falls back to
    ``localCheckpoint`` on a cluster with no durable option configured
    instead of leaving the lineage uncut."""
    global _WARNED
    spark = df.sparkSession
    try:
        sc = spark.sparkContext
        master = sc.master
    except Exception:
        # connect-style sessions expose no sparkContext; there is no
        # executor-pinned storage to lose, and no localCheckpoint —
        # leave the plan uncut rather than guess
        return df
    stage_dir = os.environ.get(STAGE_DIR_ENV)
    try:
        checkpoint_dir = sc.getCheckpointDir()
    except Exception:
        checkpoint_dir = None
    mode = _stage_mode(master, stage_dir, checkpoint_dir)
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "parquet":
        path = os.path.join(stage_dir, f"{label}_{uuid.uuid4().hex}.parquet")
        df.write.mode("error").parquet(path)
        return spark.read.parquet(path)
    if mode == "reliable":
        return df.checkpoint(eager=eager)
    if must_cut:
        return df.localCheckpoint(eager=eager)
    if not _WARNED:
        _WARNED = True
        print(f"stage_table: cluster master {master!r} with no "
              f"${STAGE_DIR_ENV} and no spark checkpoint dir — leaving "
              "lineage uncut (reused subtrees recompute per consumer); "
              f"set ${STAGE_DIR_ENV} or sc.setCheckpointDir() to restore "
              "the single-execution stage", file=sys.stderr)
    return df
