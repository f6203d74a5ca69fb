"""Unigram-LM tokenizer: Viterbi global-min semantics (vs greedy),
integer tie-breaks, trainer invariants, application counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.unigram_lm import (
    _viterbi_segment,
    learn_unigram_lm,
    unigram_segment_counts,
)


def _seg(spark, word, costs, **kw):
    words = spark.createDataFrame([(word, 1)], "w: string, freq: long")
    out = _viterbi_segment(words, costs, kw.get("max_word_len", 8), kw.get("max_piece_len", 4))
    return out.collect()[0]["pieces"]


def test_viterbi_finds_global_minimum_not_greedy(spark):
    # greedy longest-match takes 'ab'+'c' (10+100); Viterbi must take
    # 'a'+'bc' (1+1) — the defining difference vs WordPiece
    costs = [("a", 1), ("b", 50), ("c", 100), ("ab", 10), ("bc", 1)]
    assert _seg(spark, "abc", costs) == ["a", "bc"]


def test_viterbi_tie_prefers_longer_piece(spark):
    # 'ab' (4) ties 'a'+'b' (2+2) — the packed key must pick 'ab'
    costs = [("a", 2), ("b", 2), ("ab", 4)]
    assert _seg(spark, "ab", costs) == ["ab"]


def test_viterbi_single_char_fallback_covers(spark):
    # only the alphabet is priced — every char segments alone
    costs = [("x", 5), ("y", 7), ("z", 9)]
    assert _seg(spark, "zyx", costs) == ["z", "y", "x"]


def test_learn_unigram_invariants_and_determinism(spark):
    rows = [(i, "the quick brown fox " * (i % 3 + 1)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    vocab = learn_unigram_lm(docs, vocab_size=20, n_rounds=2).collect()
    pieces = {r["piece"] for r in vocab}
    # full alphabet retained (coverage guarantee)
    alphabet = set("thequickbrownfox")
    assert alphabet <= pieces
    for r in vocab:
        assert 1 <= r["piece_len"] <= 4
        assert r["cost_micro"] > 0
        assert r["is_char"] == (r["piece_len"] == 1)
    ranks = sorted((r["rank"], r["piece"]) for r in vocab)
    assert [r for r, _ in ranks] == list(range(1, len(vocab) + 1))
    again = learn_unigram_lm(docs.repartition(7), vocab_size=20, n_rounds=2).collect()
    assert sorted(map(tuple, vocab)) == sorted(map(tuple, again))


def test_segment_counts_unk_for_overlong_words(spark):
    docs = spark.createDataFrame(
        [(0, "aa bb supercalifragilistic aa")], "doc_id: long, text: string"
    )
    vocab = [("a", 3), ("b", 3), ("aa", 4), ("bb", 4)]
    got = unigram_segment_counts(docs, vocab).collect()[0]
    # 4 words; 'aa' → 1 piece (tie prefers longer), 'bb' → 1, the
    # 25-char word → UNK (1 piece, 1 unk)
    assert got["n_words"] == 4
    assert got["n_pieces"] == 4
    assert got["n_unk"] == 1
