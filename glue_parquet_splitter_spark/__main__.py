"""CLI entry point — reference O1/O20 parity (parquet-splitter.py:14-26,
:198-204): ``--NAME value`` argv or env config, then one incremental run.

    python -m glue_parquet_splitter_spark \
        --KIND pyshell --IN_DIR /data/input --OUT_DIR /data/output \
        --MARKER_DIR /data/markers [--KEY item_id] [--EXACT_LAYOUT 1]
"""

from __future__ import annotations

import logging
import os
import sys


def get_arg(name: str, default=None):
    """``--NAME value`` argv override, else env var, else default —
    the reference's Glue-style config scan (parquet-splitter.py:14-17)."""
    if f"--{name}" in sys.argv:
        i = sys.argv.index(f"--{name}") + 1
        if i >= len(sys.argv):
            raise SystemExit(f"--{name} requires a value")
        return sys.argv[i]
    return os.environ.get(name, default)


def main() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    log = logging.getLogger(__name__)

    from .pipeline import run_incremental
    from .session import get_spark

    kind = get_arg("KIND", "default")
    in_dir = get_arg("IN_DIR")
    out_dir = get_arg("OUT_DIR")
    marker_dir = get_arg("MARKER_DIR")
    key = get_arg("KEY", "item_id")
    exact = get_arg("EXACT_LAYOUT", "1") not in ("0", "false", "False")
    manifest = get_arg("MANIFEST", "outputs")
    reopen = get_arg("REPROCESS_CHANGED", "0") in ("1", "true", "True")
    if not (in_dir and out_dir and marker_dir):
        raise SystemExit("required: --IN_DIR, --OUT_DIR, --MARKER_DIR")
    if manifest not in ("outputs", "counts"):
        raise SystemExit("--MANIFEST must be 'outputs' or 'counts'")

    log.info("engine invoked: kind=%s", kind)
    spark = get_spark(f"split-{kind}")
    result = run_incremental(spark, kind, in_dir, out_dir, marker_dir,
                             key=key, exact_layout=exact, manifest=manifest,
                             reprocess_changed=reopen)
    log.info("%s", result)


if __name__ == "__main__":
    main()
