#!/usr/bin/env python
"""Adversarial-fixture oracle fuzz harness (VERDICT r10 #2).

The driver fixtures (TESTDATA.md) are deterministic and FRIENDLY:
ASCII-only text, valid JSON props, no nulls, near-tie-free ranking
keys, mild skew.  Every registered query is graded against its DuckDB
oracle only on that friendly shape, so a parity bug that needs a null,
a unicode code point, a heavy tie, or a 90 %-skewed key to fire stays
invisible.  This harness regenerates the ten fixture tables with
HOSTILE distributions — same schemas, nasty content — then re-runs the
standard query-vs-oracle compare (``oracle.run_one``) on them.  Both
engines read the identical hostile parquet, so a mismatch is a real
cross-engine parity bug, not a fixture-invariant violation.

Hostilities (seeded, reproducible):
- nulls in every non-key column (text/lang/source/n_chars, events
  value/props, c_acctbal, l_tax, embeddings label);
- empty, whitespace-only, unicode (CJK / emoji / RTL / combining
  accents), and repeat-heavy document text; exact- and near-duplicate
  texts for the dedup family;
- heavy ties: 10 distinct event timestamps for 800 events, quantities
  from 3-value pools, prices from 8-value pools, quantized embeddings
  (tied distances);
- 90 % key skew (one hot source / user / part / customer) plus a
  300-lineitem mega-order;
- degenerate groups: singleton lang / event_type / mktsegment, regions
  with no nations, nations with no customers, customers with no
  orders;
- dangling foreign keys (orders→customer, lineitem→part) to stress
  anti/semi/outer joins;
- zero vectors and exact/near-duplicate embeddings.

Classification per query:
- PASS   — query vs oracle agree on the hostile tables;
- GUARD  — the query raised one of its OWN documented fixture-invariant
  guards (e.g. pack_ppm/pack_wav's non-ASCII raise_error): the guard
  firing loudly on hostile input is the designed behavior, graded by
  matching the raise message against _GUARD_PATTERNS;
- FAIL   — value/count/schema mismatch (a parity bug) or an
  unclassified exception.

Usage:
  python scripts/fuzz_oracle.py [--seed N] [--dir OUT] [--keep]
                                [--nan] [--big] [--malformed]
                                [name ... | --module text_q ...]
No names/modules → the full registry.  Exit 1 on any FAIL.
"""

from __future__ import annotations

import argparse
import json
import re
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

# ---------------------------------------------------------------- guards
# A raise is the CORRECT response to hostile data when it comes from one
# of the engine's own documented invariant guards.  Two requirements
# (VERDICT r11 #8 + ADVICE r11): the raise must carry Spark's
# USER_RAISED marker (so an engine/binder error whose MESSAGE happens to
# mention a guard function — e.g. a DuckDB error in an
# octet_length(encode(text)) oracle — classifies FAIL, not GUARD), and
# the match runs over the UNWRAPPED exception cause chain (a Py4J
# awaitResult wrapper truncates the user message out of str(exc); the
# real raise sits in the Java cause chain).
_GUARD_MARKER = "USER_RAISED_EXCEPTION"
_GUARD_PATTERNS = (
    # pack_ppm / pack_wav byte-plane desync guards — the exact
    # raise_error message texts (operators/multimodal.py)
    r"pack_ppm: non-ASCII text for doc_id=\S+ .* would desync the P6 "
    r"pixel plane",
    r"pack_wav: non-ASCII text for doc_id=\S+ .* would desync the PCM "
    r"sample plane",
)

# Driver-fixture invariants a hostility knob may violate BY DESIGN; any
# oracle-side exception matching these is adjudicated in FUZZ.md rather
# than auto-classified.
_VOCAB = ("the a data spark join merge sort scan table row column key "
          "value batch stream window agg group filter order part line "
          "hash query big small fast slow dup vector customer").split()
_UNI = ["héllo", "naïve", "日本語テキスト", "😀emoji😀", "Ωμέγα",
        "مرحبا", "straße", "étude", "ＦＵＬＬＷＩＤＴＨ", "零一二三"]


def _text_pool(rng: np.random.Generator, n: int) -> list:
    """Hostile document texts: nulls, empties, whitespace, unicode,
    repeat-heavy, plus exact/near duplicates of earlier rows."""
    texts: list = []
    for i in range(n):
        r = rng.random()
        if r < 0.08:
            texts.append(None)
        elif r < 0.12:
            texts.append("")
        elif r < 0.16:
            texts.append(" \t  ")
        elif r < 0.28:
            k = int(rng.integers(3, 12))
            words = [str(rng.choice(_UNI)) for _ in range(k)]
            texts.append(" ".join(words))
        elif r < 0.38:
            w = str(rng.choice(_VOCAB[:4]))
            texts.append(" ".join([w] * int(rng.integers(4, 40))))
        else:
            k = int(rng.integers(5, 60))
            texts.append(" ".join(str(w) for w in rng.choice(_VOCAB, k)))
    # exact dups (15 %) and near-dups (10 %) of earlier non-null rows
    idx = [i for i, t in enumerate(texts) if t]
    for i in idx:
        r = rng.random()
        if r < 0.15 and i > 10:
            texts[i] = texts[int(rng.choice(idx[: idx.index(i)] or [idx[0]]))]
        elif r < 0.25 and texts[i] and " " in texts[i]:
            words = texts[i].split(" ")
            words[int(rng.integers(0, len(words)))] = "mutant"
            texts[i] = " ".join(words)
    return texts


def _skewed(rng, n, values, hot_frac=0.9, null_frac=0.0):
    """n draws: hot_frac goes to values[0], rest uniform over values[1:],
    null_frac nulls sprinkled on top."""
    out = np.where(rng.random(n) < hot_frac,
                   np.full(n, values[0], dtype=object),
                   rng.choice(np.array(values[1:], dtype=object), n))
    if null_frac:
        out[rng.random(n) < null_frac] = None
    return out.tolist()


def gen_fixtures(out_dir: str, seed: int = 0,
                 nan: bool = False, big: bool = False,
                 malformed: bool = False, empty: bool = False,
                 nullkeys: bool = False, dates: bool = False,
                 dupkeys: bool = False, tiny: bool = False,
                 negative: bool = False) -> None:
    """Write the ten fixture tables with hostile content, driver
    schemas.  ``nan=True`` additionally injects IEEE specials (NaN and
    ±Infinity) into events.value and embedding components — OPT-IN
    because NaN canonicalizes like NULL in the compare (a masked
    divergence class), so NaN runs are adjudicated separately.
    ``malformed=True`` injects structurally broken embeddings (NULL
    vector, empty vector, NULL components, ragged short vector —
    ADVICE r11): the shapes the well-formedness contract
    (``finite_vectors`` + its oracle mirror) must exclude identically
    in both engines."""
    rng = np.random.default_rng(seed)

    # -- documents ----------------------------------------------------
    n = 400
    texts = _text_pool(rng, n)
    if big:
        # extreme-length hostility: giant docs stress O(n²) lambda
        # traps, chunk fan-out, rolling-hash folds, and the oracle's
        # per-char UNNEST; one is a single 20k-char WORD (no spaces —
        # the token every per-word operator must cap or survive)
        texts[0] = " ".join(str(w) for w in rng.choice(_VOCAB, 20_000))
        texts[1] = "z" * 20_000
        texts[2] = ("the quick " * 5_000).strip()
    langs = _skewed(rng, n, ["en", "de", "fr", "zh"], 0.85, null_frac=0.05)
    langs[7] = "xx"                                   # singleton lang
    srcs = _skewed(rng, n, ["src0", "src1", "src2", "src3"], 0.9,
                   null_frac=0.05)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) if t is not None else None
                             for t in texts], pa.int64()),
    }), f"{out_dir}/documents.parquet")

    # -- embeddings ---------------------------------------------------
    m, dim = 300, 64
    vecs = np.round(rng.standard_normal((m, dim)), 3).astype(np.float32)
    vecs[:5] = 0.0                                     # zero vectors
    if nan:
        vecs[90, 3] = np.nan                           # IEEE specials
        vecs[91, 5] = np.inf
        vecs[92, 7] = -np.inf
    for i in range(10):                                # exact dup pairs
        vecs[20 + 2 * i + 1] = vecs[20 + 2 * i]
    for i in range(10):                                # near dups
        vecs[50 + 2 * i + 1] = vecs[50 + 2 * i] + np.float32(0.001)
    labels = np.asarray(
        _skewed(rng, m, [0, 1, 2], 0.8, null_frac=0.05), dtype=object)
    emb_lists: list = [v.tolist() for v in vecs]
    if malformed:
        # structurally broken vectors (ADVICE r11) — rows chosen clear
        # of the planted zero/dup/near-dup blocks above
        emb_lists[94] = None                           # NULL vector
        emb_lists[95] = []                             # empty vector
        emb_lists[96] = [None] + emb_lists[96][1:]     # NULL component
        emb_lists[97] = emb_lists[97][:10]             # ragged (short)
        emb_lists[98] = [None] * dim                   # all-NULL comps
    pq.write_table(pa.table({
        "vec_id": pa.array(range(1, m + 1), pa.int64()),
        "embedding": pa.array(emb_lists,
                              pa.list_(pa.float32())),
        "label": pa.array([None if v is None else int(v) for v in labels],
                          pa.int32()),
    }), f"{out_dir}/embeddings.parquet")

    # -- events ---------------------------------------------------------
    e = 800
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts_pool = base + (np.arange(10) * np.timedelta64(7200, "s")).astype(
        "timedelta64[us]")
    if dates:
        # extreme-timestamp hostility (--dates): pre-epoch with
        # fractional seconds (negative epoch + trunc-vs-round), year
        # 1900, leap day, and sub-second precision — the base pool is
        # whole-hour so none of these paths ever fire on it.  Year
        # 9999 stays OUT: interval arithmetic near the engine max is a
        # separate crash class (ANSI overflow), not a value-parity one.
        extremes = np.array(
            [np.datetime64("1969-12-31T23:59:59.999999", "us"),
             np.datetime64("1900-01-01T00:00:00", "us"),
             np.datetime64("2024-02-29T23:59:59.500000", "us"),
             np.datetime64("2024-03-01T00:00:00.123456", "us")])
        ts_pool = np.concatenate([ts_pool[:6], extremes])
    ts = rng.choice(ts_pool, e)                        # HEAVY ties
    props = []
    for _ in range(e):
        r = rng.random()
        if r < 0.10:
            props.append(None)
        elif r < 0.15:
            props.append("")
        elif r < 0.20:
            props.append("not json")
        elif r < 0.23:
            props.append('{"k": ')
        else:
            props.append('{"k": %d}' % int(rng.integers(0, 100)))
    vals = np.round(rng.choice([0.0, 1.5, -2.25, 10.0, 99.5], e), 2
                    ).astype(object)
    vals[rng.random(e) < 0.10] = None
    if nan:
        idx = rng.random(e)
        vals[idx < 0.03] = float("nan")
        vals[(idx >= 0.03) & (idx < 0.04)] = float("inf")
        vals[(idx >= 0.04) & (idx < 0.05)] = float("-inf")
    etype = _skewed(rng, e, ["click", "view", "purchase"], 0.8)
    etype[3] = "singleton"
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, e + 1), pa.int64()),
        "ts": pa.array(ts.tolist(), pa.timestamp("us")),
        "user_id": pa.array([int(u) for u in
                             _skewed(rng, e, list(range(1, 11)), 0.9)],
                            pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array([None if v is None else float(v) for v in vals],
                          pa.float64()),
        "props": pa.array(props, pa.string()),
    }), f"{out_dir}/events.parquet")

    # -- region / nation (regions 3,4 have NO nations) -----------------
    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array([f"REGION{i}" for i in range(5)], pa.string()),
    }), f"{out_dir}/region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION{i:02d}" for i in range(25)],
                           pa.string()),
        "n_regionkey": pa.array([i % 3 for i in range(25)], pa.int32()),
    }), f"{out_dir}/nation.parquet")

    # -- customer (nations 6..24 have NO customers; hot nation 0) ------
    c = 150
    acct = np.round(rng.choice([0.0, -10.5, 500.25, 999.99], c), 2
                    ).astype(object)
    acct[rng.random(c) < 0.03] = None
    seg = _skewed(rng, c, ["BUILDING", "MACHINERY", "FURNITURE"], 0.8)
    seg[0] = "SINGLETON"
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, c + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i:06d}" for i in range(1, c + 1)],
                           pa.string()),
        "c_nationkey": pa.array([int(v) for v in
                                 _skewed(rng, c, list(range(6)), 0.8)],
                                pa.int32()),
        "c_acctbal": pa.array([None if v is None else float(v)
                               for v in acct], pa.float64()),
        "c_mktsegment": pa.array(seg, pa.string()),
    }), f"{out_dir}/customer.parquet")

    # -- supplier -------------------------------------------------------
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, 11), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, 11)],
                           pa.string()),
        "s_nationkey": pa.array([i % 4 for i in range(10)], pa.int32()),
        "s_acctbal": pa.array(
            np.round(rng.choice([1.0, 250.5], 10), 2).tolist(),
            pa.float64()),
    }), f"{out_dir}/supplier.parquet")

    # -- part (tied sizes/prices) --------------------------------------
    p = 200
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(1, p + 1), pa.int64()),
        "p_name": pa.array([f"part {i} {_VOCAB[i % len(_VOCAB)]}"
                            for i in range(1, p + 1)], pa.string()),
        "p_brand": pa.array(_skewed(rng, p, ["Brand#1", "Brand#2"], 0.85),
                            pa.string()),
        "p_type": pa.array([f"TYPE#{i % 3}" for i in range(p)],
                           pa.string()),
        "p_size": pa.array([int(v) for v in
                            rng.choice([1, 5, 50], p)], pa.int32()),
        "p_retailprice": pa.array(
            np.round(rng.choice([9.99, 100.0, 100.0, 2500.5], p), 2
                     ).tolist(), pa.float64()),
    }), f"{out_dir}/part.parquet")

    # -- orders (hot customer 1; 3 % dangling custkeys; tied prices) ----
    o = 1500
    cust = np.asarray([int(v) for v in
                       _skewed(rng, o, list(range(1, 31)), 0.85)])
    cust[rng.random(o) < 0.03] += 10_000               # dangling FK
    odate = (np.datetime64("2024-01-01", "us")
             + rng.choice((np.arange(5) * np.timedelta64(86400, "s")
                           ).astype("timedelta64[us]"), o))
    if dates:
        # sprinkle extreme order days: pre-epoch, year 1900, leap day
        oex = np.array([np.datetime64("1969-12-31T00:00:00", "us"),
                        np.datetime64("1900-01-01T00:00:00", "us"),
                        np.datetime64("2024-02-29T00:00:00", "us")])
        pick = rng.random(o) < 0.05
        odate[pick] = rng.choice(oex, int(pick.sum()))
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, o + 1), pa.int64()),
        "o_custkey": pa.array(cust.tolist(), pa.int64()),
        "o_orderstatus": pa.array(_skewed(rng, o, ["O", "F", "P"], 0.7),
                                  pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.choice([10.0, 10.0, 55.5, 100.0, 100.0, 2000.25,
                                 31415.9, 0.01], o), 2).tolist(),
            pa.float64()),
        "o_orderdate": pa.array(odate.tolist(), pa.timestamp("us")),
        "o_orderpriority": pa.array(
            _skewed(rng, o, ["1-URGENT", "3-MEDIUM", "5-LOW"], 0.6),
            pa.string()),
    }), f"{out_dir}/orders.parquet")

    # -- lineitem (mega-order, hot part, dangling parts, tied measures) -
    okeys: list[int] = [1] * 300                       # 300-line mega-order
    while len(okeys) < 6000:
        k = int(rng.integers(2, o + 1))
        okeys.extend([k] * int(rng.integers(1, 8)))
    okeys = okeys[:6000]
    li = len(okeys)
    pkey = np.asarray([int(v) for v in
                       _skewed(rng, li, list(range(1, p + 1)), 0.9)])
    pkey[rng.random(li) < 0.02] += p                   # dangling FK
    linenum: list[int] = []
    prev, c_ = None, 0
    for k in okeys:
        c_ = c_ + 1 if k == prev else 1
        linenum.append(c_)
        prev = k
    tax = np.round(rng.choice([0.0, 0.08], li), 2).astype(object)
    tax[rng.random(li) < 0.02] = None
    sdate = (np.datetime64("2024-02-01", "us")
             + rng.choice((np.arange(6) * np.timedelta64(86400, "s")
                           ).astype("timedelta64[us]"), li))
    if dates:
        pick = rng.random(li) < 0.05    # leap-day ship dates
        sdate[pick] = np.datetime64("2024-02-29T00:00:00", "us")
    pq.write_table(pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(pkey.tolist(), pa.int64()),
        "l_suppkey": pa.array([int(v) for v in rng.integers(1, 11, li)],
                              pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(rng.choice([1.0, 25.0, 50.0], li).tolist(),
                               pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.choice([5.0, 5.0, 77.7, 100.0, 100.0, 999.99,
                                 12345.6, 0.01, 42.0, 1e6], li), 2
                     ).tolist(), pa.float64()),
        "l_discount": pa.array(rng.choice([0.0, 0.05, 0.1], li).tolist(),
                               pa.float64()),
        "l_tax": pa.array([None if v is None else float(v) for v in tax],
                          pa.float64()),
        "l_returnflag": pa.array(_skewed(rng, li, ["N", "R", "A"], 0.7),
                                 pa.string()),
        "l_linestatus": pa.array(_skewed(rng, li, ["O", "F"], 0.6),
                                 pa.string()),
        "l_shipdate": pa.array(sdate.tolist(), pa.timestamp("us")),
    }), f"{out_dir}/lineitem.parquet")

    if tiny:
        # before dupkeys on purpose: a duplicate of a surviving tiny
        # row keeps the dup mass visible at 1-5 rows (the pairing the
        # --tiny --dupkeys sweep exercises)
        _shrink_all_tables(out_dir, seed)
    if negative:
        _flip_measure_signs(out_dir, seed)
    if dupkeys:
        _inject_dup_keys(out_dir, seed)
    if nullkeys:
        # after dupkeys on purpose: the FK-null pass then operates on
        # the expanded tables, so a conflicting duplicate can ALSO lose
        # its dimension reference — the pairing the interaction sweep
        # exercises
        _inject_null_keys(out_dir, seed)
    if empty:
        _truncate_all_tables(out_dir)


_TABLES = ("documents", "embeddings", "events", "region", "nation",
           "customer", "supplier", "part", "orders", "lineitem")

# Join/group KEY columns the base hostility deliberately keeps clean
# ("nulls in every NON-KEY column").  The --nullkeys dimension nulls a
# seeded ~6 % of each: FK columns stress join/anti-join NULL semantics,
# categorical group keys stress cube/rollup/grouping-sets
# NULL-indistinguishability (a real NULL key colliding with the
# super-aggregate's synthetic NULL), and a timestamp group key stresses
# date-bucketing.  Primary keys stay non-NULL — the upstream-bug shape
# this models is a fact row with a missing dimension reference.
_NULLKEY_COLS = {
    "nation": ["n_regionkey"],
    "customer": ["c_nationkey", "c_mktsegment"],
    "supplier": ["s_nationkey"],
    "part": ["p_brand", "p_type", "p_size"],
    "orders": ["o_custkey", "o_orderstatus", "o_orderpriority",
               "o_orderdate"],
    "lineitem": ["l_partkey", "l_suppkey", "l_returnflag",
                 "l_linestatus"],
    "events": ["user_id", "event_type"],
}


def _inject_null_keys(out_dir: str, seed: int) -> None:
    """Null a seeded fraction of the join/group key columns in the
    already-written fixtures (--nullkeys).  Post-processing keeps the
    base generator byte-identical when the knob is off."""
    rng = np.random.default_rng(seed + 7777)
    for tname, cols in _NULLKEY_COLS.items():
        path = f"{out_dir}/{tname}.parquet"
        tbl = pq.read_table(path)
        n = tbl.num_rows
        out = []
        for field in tbl.schema:
            col = tbl.column(field.name)
            if field.name in cols:
                mask = rng.random(n) < 0.06
                if not mask.any():          # small dims (e.g. nation):
                    mask[int(rng.integers(n))] = True  # guarantee >= 1
                col = pa.array(
                    [None if m else v
                     for v, m in zip(col.to_pylist(), mask)],
                    type=field.type)
            out.append(col)
        pq.write_table(pa.Table.from_arrays(out, schema=tbl.schema), path)


# Primary-key columns per table (--dupkeys).  Every other hostility
# dimension dirties FKs, values, or text; none violates PRIMARY-key
# uniqueness — the upstream-bug shape this models is a double-delivered
# CDC batch / reprocessed partition, which lands the same pk twice,
# sometimes byte-identical (safe dedup) and sometimes CONFLICTING
# (same pk, different attributes — the case that breaks join
# multiplicities, dropDuplicates determinism, SCD2 interval building,
# and every DISTINCT-by-pk probe differently per engine).
_DUPKEY_SPECS: dict[str, dict] = {
    # table: {pk: [cols], conflict: {col: mutator-tag}}
    "documents": {"pk": ["doc_id"],
                  "conflict": {"text": "text", "n_chars": "derived_len"}},
    "embeddings": {"pk": ["vec_id"],
                   "conflict": {"embedding": "vec", "label": "int_bump"}},
    "events": {"pk": ["event_id"],
               "conflict": {"value": "num_bump", "event_type": "str_tag"}},
    "region": {"pk": ["r_regionkey"], "conflict": {"r_name": "str_tag"}},
    "nation": {"pk": ["n_nationkey"],
               "conflict": {"n_name": "str_tag",
                            "n_regionkey": "int_bump"}},
    "customer": {"pk": ["c_custkey"],
                 "conflict": {"c_mktsegment": "str_tag",
                              "c_acctbal": "num_bump"}},
    "supplier": {"pk": ["s_suppkey"],
                 "conflict": {"s_nationkey": "int_bump"}},
    "part": {"pk": ["p_partkey"], "conflict": {"p_brand": "str_tag",
                                               "p_retailprice": "num_bump"}},
    "orders": {"pk": ["o_orderkey"],
               "conflict": {"o_totalprice": "num_bump",
                            "o_orderpriority": "str_tag"}},
    # composite pk — duplicates repeat the (orderkey, linenumber) PAIR
    "lineitem": {"pk": ["l_orderkey", "l_linenumber"],
                 "conflict": {"l_extendedprice": "num_bump",
                              "l_returnflag": "str_tag"}},
}


def _mutate_cell(tag: str, v, row: dict):
    """Deterministic conflicting-attribute mutators (value-level, so
    the duplicate is the same row EXCEPT the conflict columns)."""
    if tag == "text":
        return ("dup conflict copy" if v is None
                else str(v) + " dupconflict")
    if tag == "derived_len":        # n_chars stays consistent with text
        t = row.get("text")
        t = ("dup conflict copy" if t is None else str(t) + " dupconflict")
        return len(t)
    if tag == "vec":
        if not isinstance(v, list) or not v:
            return v
        return [(v[0] + 0.002 if v[0] is not None else v[0])] + v[1:]
    if tag == "int_bump":
        return None if v is None else int(v) + 1
    if tag == "num_bump":
        return None if v is None else round(float(v) + 11.11, 2)
    if tag == "str_tag":
        return "DUPCONFLICT" if v is None else str(v) + "~dup"
    raise ValueError(tag)


def _inject_dup_keys(out_dir: str, seed: int) -> None:
    """Append rows that REPEAT existing primary keys (--dupkeys): a
    seeded ~4 % of each table (min 2), half byte-identical duplicates
    (the idempotent-redelivery case every exact-dedup must absorb) and
    half CONFLICTING duplicates (same pk, mutated attributes — the
    case where any "the row for this pk" assumption becomes
    nondeterministic unless the query pins a total order).
    Post-processing keeps the base generator byte-identical when off.
    """
    rng = np.random.default_rng(seed + 424242)
    for tname, spec in _DUPKEY_SPECS.items():
        path = f"{out_dir}/{tname}.parquet"
        tbl = pq.read_table(path)
        n = tbl.num_rows
        k = max(2, int(round(n * 0.04)))
        idx = rng.choice(n, size=min(k, n), replace=False)
        rows = tbl.to_pylist()
        extra = []
        for j, i in enumerate(sorted(int(x) for x in idx)):
            row = dict(rows[i])
            if j % 2 == 1:                      # conflicting duplicate
                for col, tag in spec["conflict"].items():
                    row[col] = _mutate_cell(tag, row.get(col), rows[i])
            extra.append(row)
        if not extra:
            continue
        add = pa.Table.from_pylist(extra, schema=tbl.schema)
        pq.write_table(pa.concat_tables([tbl, add]), path)


def _shrink_all_tables(out_dir: str, seed: int) -> None:
    """Shrink every fixture to a seeded 1-5 rows (--tiny).  --empty
    proved ZERO rows safe; nothing yet probed corpora SMALLER than the
    engine's model constants (kmeans k=4 with 2 vectors, IVFPQ coarse
    lists / codebook stride sampling beyond the corpus, JL projection
    dims, FFD bins with one doc, BPE's K merges on a 3-word corpus,
    top-32 inits with <32 candidates).  These underflow paths are
    DEGENERATE models, not absent ones — exactly what a per-partition
    run at 100 TB sees on a near-empty partition (VERDICT r13 #4).
    A seeded random subset, not head-k: head rows are the planted
    hostility rows (zero vectors, mega-order), and always keeping
    them would make the tiny corpus systematically unrepresentative.
    """
    rng = np.random.default_rng(seed + 31337)
    for tname in _TABLES:
        path = f"{out_dir}/{tname}.parquet"
        tbl = pq.read_table(path)
        k = int(rng.integers(1, 6))
        idx = sorted(int(i) for i in
                     rng.choice(tbl.num_rows, size=min(k, tbl.num_rows),
                                replace=False))
        pq.write_table(tbl.take(idx), path)


# Monetary/measure columns per table (--negative).  The engines'
# integer floor-division rounding, winsorization, and sign-dependent
# arithmetic were hardened against a LATENT class (fixtures never
# produce negative sums); flipping signs makes the class real:
# negative revenue models returns/corrections, negative balances are
# ordinary, negative event values model reversals.
_NEGATIVE_COLS = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_extendedprice", "l_quantity"],
    "events": ["value"],
}


def _flip_measure_signs(out_dir: str, seed: int) -> None:
    """Flip the sign of a seeded ~40 % of each measure column's
    non-null, non-zero rows (--negative), guaranteeing at least one
    flip per column.  Post-processing keeps the base generator
    byte-identical when the knob is off."""
    rng = np.random.default_rng(seed + 91919)
    for tname, cols in _NEGATIVE_COLS.items():
        path = f"{out_dir}/{tname}.parquet"
        tbl = pq.read_table(path)
        n = tbl.num_rows
        out = []
        for field in tbl.schema:
            col = tbl.column(field.name)
            if field.name in cols and n:
                mask = rng.random(n) < 0.4
                vals = col.to_pylist()
                flippable = [i for i, v in enumerate(vals)
                             if v is not None and v == v and v != 0]
                if flippable and not any(mask[i] for i in flippable):
                    mask[flippable[int(rng.integers(len(flippable)))]] = True
                col = pa.array(
                    [-v if m and v is not None and v == v and v != 0
                     else v for v, m in zip(vals, mask)],
                    type=field.type)
            out.append(col)
        pq.write_table(pa.Table.from_arrays(out, schema=tbl.schema), path)


def _truncate_all_tables(out_dir: str) -> None:
    """Rewrite every fixture as ZERO rows, schema preserved (--empty).
    Models the reference's own O9 class — a day with no data anywhere —
    at the whole-corpus level: every query must return an empty (or
    well-defined degenerate) result in BOTH engines, not crash."""
    for tname in _TABLES:
        path = f"{out_dir}/{tname}.parquet"
        tbl = pq.read_table(path)
        pq.write_table(tbl.slice(0, 0), path)


def exception_chain_text(exc: BaseException) -> str:
    """Full match text for classification: every exception in the
    Python __cause__/__context__ chain PLUS, for Py4J-wrapped Spark
    errors, the Java exception's own cause chain (``getCause``), where
    the real raise_error message lives when str(exc) is a truncated
    ``awaitResult`` wrapper (VERDICT r11 #8)."""
    parts: list[str] = []
    seen: set[int] = set()
    e: BaseException | None = exc
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        parts.append(f"{type(e).__name__}: {e}")
        # Java throwables hide in three places: py4j's Py4JJavaError
        # exposes .java_exception; pyspark 4's CapturedException wraps
        # the Py4JJavaError in _origin/_cause instead.
        throwables = [getattr(e, "java_exception", None)]
        for attr in ("_origin", "_cause"):
            wrapped = getattr(e, attr, None)
            throwables.append(getattr(wrapped, "java_exception", None))
        for je in throwables:
            if je is None:
                continue
            try:
                cause, depth = je, 0
                while cause is not None and depth < 8:
                    parts.append(cause.toString())
                    cause, depth = cause.getCause(), depth + 1
            except Exception:
                pass  # JVM gone / not a real Java throwable
        e = e.__cause__ or e.__context__
    return "\n".join(parts)


def classify_exception(exc: BaseException) -> str:
    msg = exception_chain_text(exc)
    if _GUARD_MARKER not in msg:
        return "FAIL"  # not a designed raise_error, whatever it mentions
    for pat in _GUARD_PATTERNS:
        if re.search(pat, msg):
            return "GUARD"
    return "FAIL"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dir", default=None,
                    help="fixture output dir (default: fresh tempdir)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the generated fixture dir")
    ap.add_argument("--module", action="append", default=[],
                    help="run every query from this queries/ module "
                         "(e.g. text_q); repeatable")
    ap.add_argument("--big", action="store_true",
                    help="plant extreme-length documents (20k chars)")
    ap.add_argument("--nan", action="store_true",
                    help="inject NaN/±Inf into events.value and "
                         "embeddings (adjudicated separately)")
    ap.add_argument("--malformed", action="store_true",
                    help="inject structurally broken embeddings (NULL/"
                         "empty/ragged vectors, NULL components)")
    ap.add_argument("--nullkeys", action="store_true",
                    help="null ~6%% of join/group KEY columns (FKs, "
                         "categorical group keys, a timestamp key)")
    ap.add_argument("--empty", action="store_true",
                    help="truncate every fixture table to ZERO rows "
                         "(the reference's O9 class, corpus-wide)")
    ap.add_argument("--dates", action="store_true",
                    help="extreme timestamps: pre-epoch + fractional "
                         "seconds, year 1900, leap day")
    ap.add_argument("--dupkeys", action="store_true",
                    help="append rows repeating existing PRIMARY keys "
                         "(~4%% per table): half exact duplicates, "
                         "half conflicting (same pk, mutated attrs)")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink every table to a seeded 1-5 rows "
                         "(degenerate-model underflow paths: smaller "
                         "than kmeans k, codebook strides, FFD bins)")
    ap.add_argument("--negative", action="store_true",
                    help="flip signs on ~40%% of monetary/measure "
                         "values (prices, balances, quantities, "
                         "event values)")
    ap.add_argument("--json", default=None,
                    help="also write a {name: status} JSON ledger here")
    args = ap.parse_args()

    from glue_parquet_splitter_spark.oracle import run_one
    from glue_parquet_splitter_spark.queries import load_all_modules
    from glue_parquet_splitter_spark.session import get_spark

    reg = load_all_modules()
    todo = list(args.names)
    for mod in args.module:
        todo += [n for n, s in reg.items()
                 if s.fn.__module__.rsplit(".", 1)[-1] == mod]
    if not todo:
        todo = list(reg)
    unknown = [n for n in todo if n not in reg]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    out_dir = args.dir or tempfile.mkdtemp(prefix="fuzz_fixtures_")
    import os
    os.makedirs(out_dir, exist_ok=True)
    gen_fixtures(out_dir, args.seed, nan=args.nan, big=args.big,
                 malformed=args.malformed, empty=args.empty,
                 nullkeys=args.nullkeys, dates=args.dates,
                 dupkeys=args.dupkeys, tiny=args.tiny,
                 negative=args.negative)
    print(f"hostile fixtures (seed={args.seed}, nan={args.nan}, "
          f"big={args.big}, malformed={args.malformed}, "
          f"nullkeys={args.nullkeys}, empty={args.empty}, "
          f"dates={args.dates}, dupkeys={args.dupkeys}, "
          f"tiny={args.tiny}, negative={args.negative}) -> {out_dir}")

    spark = get_spark("fuzz_oracle", shuffle_partitions=8)
    statuses: dict[str, str] = {}
    details: dict[str, str] = {}
    rows: dict[str, int] = {}
    for name in todo:
        t0 = time.time()
        try:
            ok, msg = run_one(spark, out_dir, name, rows_out=rows)
            status = "PASS" if ok else "FAIL"
        except BaseException as exc:  # noqa: BLE001 — classify guards
            status = classify_exception(exc)
            if status == "GUARD":
                # record the ROOT-CAUSE raise message, not the (possibly
                # truncated) Py4J wrapper head (VERDICT r11 #8)
                chain = exception_chain_text(exc)
                m = next((re.search(p, chain) for p in _GUARD_PATTERNS
                          if re.search(p, chain)), None)
                msg = (f"{type(exc).__name__}: "
                       f"{m.group(0)[:260] if m else str(exc)[:260]}")
            else:
                msg = f"{type(exc).__name__}: {str(exc)[:300]}"
        statuses[name] = status
        details[name] = msg
        print(f"{status:5s} {name:40s} {time.time() - t0:6.1f}s  "
              f"{msg[:160]}")
    counts = {s: sum(1 for v in statuses.values() if v == s)
              for s in ("PASS", "GUARD", "FAIL")}
    print(f"\nFUZZ: {counts['PASS']} pass, {counts['GUARD']} guard, "
          f"{counts['FAIL']} fail / {len(todo)} (seed={args.seed})")
    if args.json:
        # per-query Spark row counts ride the ledger so a query that
        # passes with ZERO rows on every committed regime is lintable
        # (check_repo non-emptiness lint, VERDICT r13 #3)
        with open(args.json, "w") as f:
            json.dump({"seed": args.seed, "statuses": statuses,
                       "rows": rows,
                       "details": {k: v for k, v in details.items()
                                   if statuses[k] != "PASS"}}, f, indent=1)
    if counts["FAIL"]:
        print("failing:", " ".join(n for n, s in statuses.items()
                                   if s == "FAIL"))
    if not args.keep and args.dir is None:
        shutil.rmtree(out_dir, ignore_errors=True)
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
