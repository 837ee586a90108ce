"""Unigram-LM tokenizer training (VERDICT r10 #5): K-round EM loss
monotonicity, vocab pruning, and the always-segmentable invariant."""

import pyspark.sql.functions as F

from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()


def test_em_loss_monotone_nonincreasing(spark, sf_dir):
    rows = {r["round"]: r for r in
            REG["unigram_lm_train"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    losses = [rows[r]["total_cost_micro"] for r in (1, 2, 3)]
    assert losses[0] >= losses[1] >= losses[2], losses
    # the fixture converges: pruning the unused init pieces must
    # strictly improve the model at least once
    assert losses[0] > losses[2]


def test_vocab_prunes_and_keeps_singles(spark, sf_dir):
    rows = {r["round"]: r for r in
            REG["unigram_lm_train"].fn(spark, sf_dir).collect()}
    # round 1 runs on the init inventory; round 2 on the pruned vocab
    assert rows[1]["n_pieces"] > rows[2]["n_pieces"] >= rows[3]["n_pieces"]
    # singles can never prune out: vocab >= |distinct chars of corpus
    # words <= 12 chars|
    from glue_parquet_splitter_spark.queries.tokenizer_q import _uni_words

    n_chars = (_uni_words(spark, sf_dir)
               .select(F.explode(F.split("w", "")).alias("c"))
               .filter(F.col("c") != "").distinct().count())
    assert rows[3]["n_pieces"] >= n_chars


def test_segmenter_tiebreak_total_order():
    """The (cost, np, path) tie-break is a total order shared with the
    oracle's ROW_NUMBER: equal-cost segmentations pick fewest pieces,
    then the lexicographically smallest path."""
    from glue_parquet_splitter_spark.queries.tokenizer_q import (
        _uni_segmenter,
    )
    import pandas as pd

    costs = {"a": 10, "b": 10, "ab": 20, "ba": 20, "aba": 40}
    fn = _uni_segmenter(costs)
    [out] = list(fn(iter([pd.DataFrame({"w": ["abab"], "wf": [1]})])))
    # candidates at cost 40: 'a b a b' (np=4), 'ab ab' (np=2),
    # 'a ba b' (np=3), 'ab a b'(np=3)... fewest pieces wins
    assert out.loc[0, "cost"] == 40
    assert out.loc[0, "path"] == "ab ab"
