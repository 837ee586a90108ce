"""WordPiece UNK machinery (VERDICT r12 #5): the whole-word-[UNK]
rule, the capped singles store, and that the held-out audit actually
exercises the UNK branch (it was structurally dead on corpus-only
input before the vocab-budget cut)."""

import pandas as pd
import pyspark.sql.functions as F

from glue_parquet_splitter_spark.queries.tokenizer_q import (
    _WP_VSINGLE,
    _wp_greedy,
    _wp_stores,
    wordpiece_unk_rate,
)


def _encode(words, init_set, cont_set, unk):
    fn = _wp_greedy(frozenset(init_set), frozenset(cont_set), unk=unk)
    out = pd.concat(list(fn([pd.DataFrame({"w": words})])))
    return {r.w: (r.np, getattr(r, "unk", None)) for r in out.itertuples()}


def test_wp_greedy_unk_is_word_atomic():
    """BERT's rule: one unmatched position anywhere -> the WHOLE word
    is one [UNK] token; a fully matchable word keeps its greedy piece
    count."""
    init, cont = {"a", "b", "ab"}, {"a", "b", "c"}
    got = _encode(["abba", "abxa", "xab", "abbc"], init, cont, unk=True)
    assert got["abba"] == (3, False)   # ab|b|a
    assert got["abxa"] == (1, True)    # x unmatched mid-word
    assert got["xab"] == (1, True)     # x unmatched at init position
    assert got["abbc"] == (3, False)   # ab|b|c (c only in cont store)


def test_wp_greedy_unk_false_unchanged():
    """The fertility callers' contract is untouched: unk=False output
    has no unk column and the piece counts match the unk=True ones on
    encodable words."""
    init = cont = {"a", "b", "c", "ab"}
    a = _encode(["abc", "cab"], init, cont, unk=False)
    b = _encode(["abc", "cab"], init, cont, unk=True)
    assert a["abc"][1] is None and b["abc"][1] is False
    assert a["abc"][0] == b["abc"][0]
    assert a["cab"][0] == b["cab"][0]


def test_capped_singles_store(spark):
    """vsingle=K keeps exactly min(K, alphabet) single chars in each
    store, while the uncapped store keeps them all."""
    words = spark.createDataFrame(
        [("aab", 10), ("bc", 5), ("cd", 2), ("de", 1)], ["w", "wf"])
    init_full, _ = _wp_stores(words)
    init_cap, cont_cap = _wp_stores(words, vsingle=2)
    full_singles = {r.piece for r in init_full.collect()
                    if len(r.piece) == 1}
    cap_singles = {r.piece for r in init_cap.collect()
                   if len(r.piece) == 1}
    assert full_singles == {"a", "b", "c", "d", "e"}
    # weighted occurrence: a=20 (two positions x wf 10), b=15, c=7 ...
    assert cap_singles == {"a", "b"}
    assert {r.piece for r in cont_cap.collect()
            if len(r.piece) == 1} == {"a", "b"}


def test_unk_branch_fires_on_held_out_corpus(spark, sf_dir):
    """The audit's reason to exist: with the top-{K} singles cut, the
    held-out split of the fixture corpus produces a nonzero [UNK]
    rate in at least one language (rates bounded in (0, 1))."""
    rows = wordpiece_unk_rate(spark, sf_dir).collect()
    assert rows
    assert any(r["n_unk"] > 0 for r in rows), (
        f"UNK branch dead with vsingle={_WP_VSINGLE}")
    for r in rows:
        assert 0.0 <= r["unk_rate"] < 1.0
        assert r["n_unk"] <= r["n_words"]
