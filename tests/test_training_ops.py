"""Training-pipeline hygiene ops: PII redaction, sequence packing,
benchmark decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng
from data_pipeline_childcare_spark.operators.contamination import benchmark_contamination
from data_pipeline_childcare_spark.operators.packing import pack_sequences
from data_pipeline_childcare_spark.operators.redact import redact_text, scrub_pii


def test_pii_counts_and_redaction(spark):
    rows = [
        (1, "联系 alice@corp.example.cn 或 13812345678"),
        (2, "身份证 11010119900307897X 电话 15987654321"),
        (3, "没有任何敏感信息的文本"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_idcard"]) == (1, 1, 0)
    assert (got[2]["n_email"], got[2]["n_phone"], got[2]["n_idcard"]) == (0, 1, 1)
    assert (got[3]["n_email"], got[3]["n_phone"], got[3]["n_idcard"]) == (0, 0, 0)
    red = {r["doc_id"]: r["t"] for r in df.select("doc_id", redact_text("text").alias("t")).collect()}
    assert red[1] == "联系 [EMAIL] 或 [PHONE]"
    assert red[2] == "身份证 [IDCARD] 电话 [PHONE]"
    assert red[3] == "没有任何敏感信息的文本"


def test_pack_sequences_invariants(spark):
    docs = eng.load_table(spark, "documents", "/root/testdata/sf0.001")
    packed = pack_sequences(docs, seq_len=512, n_shards=4).collect()
    assert len(packed) == docs.count()
    by_shard: dict[int, list] = {}
    for r in packed:
        assert 0 <= r["shard"] < 4 and 0 <= r["bin_offset"] < 512
        by_shard.setdefault(r["shard"], []).append(r)
    # per shard: positions are a gapless token stream
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r["bin_id"], r["bin_offset"]))
        pos = 0
        for r in rows:
            assert r["bin_id"] * 512 + r["bin_offset"] == pos, (shard, r)
            pos += r["n_tokens"]


def test_pack_audit_hand_counts(spark):
    from data_pipeline_childcare_spark.operators.packing import pack_audit

    # one shard, seq_len 10: stream positions 0,7,13 → doc at 7 with
    # 6 tokens straddles the bin-1 boundary; total 16 → 2 bins,
    # tail waste 4, fill 16/20 = 0.8
    packed = spark.createDataFrame(
        [(1, 0, 7, 0, 0), (2, 0, 6, 0, 7), (3, 0, 3, 1, 3)],
        "doc_id long, shard long, n_tokens long, bin_id long, bin_offset long",
    )
    got = pack_audit(packed, seq_len=10).collect()[0]
    assert (got.n_docs, got.total_tokens, got.n_bins) == (3, 16, 2)
    assert (got.tail_waste, got.n_straddling, got.fill_ppm) == (4, 1, 800_000)
    # audit agrees with the real layout end-to-end
    docs = eng.load_table(spark, "documents", "/root/testdata/sf0.001")
    layout = pack_sequences(docs, seq_len=512, n_shards=4)
    audit = {r.shard: r for r in pack_audit(layout, seq_len=512).collect()}
    toks = {
        r.shard: (r.n, r.t)
        for r in layout.groupBy("shard")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    for s, (n, t) in toks.items():
        a = audit[s]
        assert (a.n_docs, a.total_tokens) == (n, t)
        assert a.n_bins == (t + 511) // 512
        assert a.tail_waste == a.n_bins * 512 - t


def test_benchmark_contamination_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence with different words entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in benchmark_contamination(docs, bench).collect()}
    assert got[1]["contamination"] == 1.0  # exact benchmark copy
    assert got[2]["contamination"] == 0.0 and got[2]["matched"] == 0


def test_cap_per_key_two_phase_matches_naive_window(spark):
    """Skew-aware cap = naive single-window cap, row for row; under-cap
    keys keep every row (and never sort)."""
    from pyspark.sql import Window

    from data_pipeline_childcare_spark.operators.split import _bucket_hex, cap_per_key

    rows = [(i, "hot" if i < 40 else f"cold{i % 3}") for i in range(52)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    capped = cap_per_key(df, ("source",), cap=5, id_col="doc_id")

    w = Window.partitionBy("source").orderBy(_bucket_hex(F.col("doc_id"), "cap"), "doc_id")
    naive = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .drop("_rn")
    )
    got = {(r["doc_id"], r["source"]) for r in capped.collect()}
    want = {(r["doc_id"], r["source"]) for r in naive.collect()}
    assert got == want
    # hot key capped to 5; cold keys (4 rows each) kept whole
    per_key = {r["source"]: r["n"] for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_key["hot"] == 5
    assert all(v == 4 for k, v in per_key.items() if k != "hot")
    # determinism: same salt → same survivors
    again = {(r["doc_id"], r["source"]) for r in cap_per_key(df, ("source",), cap=5).collect()}
    assert again == got


def test_unigram_logprob_orders_common_above_rare(spark):
    from data_pipeline_childcare_spark.operators.tfidf import unigram_logprob_scores

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),          # only common tokens
            (2, "the zyzzyva"),              # one rare token
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in unigram_logprob_scores(docs).collect()}
    assert got[1]["n_tokens"] == 4 and got[2]["n_tokens"] == 2
    # p(the)=5/6, p(zyzzyva)=1/6: doc 1 averages higher (less negative)
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]
    import math
    exp1 = round(round(4 * math.log10(5 / 6), 6) / 4, 6)
    assert got[1]["avg_logprob"] == pytest.approx(exp1, abs=1e-9)


def test_corpus_line_dedup_drops_cross_doc_boilerplate(spark):
    from data_pipeline_childcare_spark.operators.cleaning import (
        corpus_line_dedup,
    )

    banner = "Accept cookies to continue"
    docs = spark.createDataFrame(
        [(i, f"unique opening {i}\n{banner}\nunique closing {i}") for i in range(8)]
        + [(100, banner)],  # a doc that is ONLY boilerplate
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in corpus_line_dedup(docs, max_df=5).collect()}
    assert len(out) == 9
    for i in range(8):
        assert out[i]["clean_text"] == f"unique opening {i}\nunique closing {i}"
        assert out[i]["n_lines_kept"] == 2
    assert out[100]["clean_text"] == "" and out[100]["n_lines_kept"] == 0


def test_corpus_line_dedup_below_threshold_untouched(spark):
    from data_pipeline_childcare_spark.operators.cleaning import (
        corpus_line_dedup,
    )

    shared = "appears in three docs only"
    docs = spark.createDataFrame(
        [(i, f"body {i}\n{shared}") for i in range(3)],
        "doc_id long, text string",
    )
    out = corpus_line_dedup(docs, max_df=5).collect()
    assert all(r["n_lines_kept"] == 2 for r in out)


def test_dsir_weights_favor_target_lookalikes(spark):
    """A pool doc written in the target domain's vocabulary must
    out-weigh a pool doc of off-domain tokens, and weights must be
    invariant to pool repartitioning (canonical rounding)."""
    from data_pipeline_childcare_spark.operators.tfidf import dsir_logratio_weights

    target = spark.createDataFrame(
        [(100 + i, "medical clinical trial dosage patient outcome " * 4) for i in range(3)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "clinical trial patient dosage medical outcome"),
            (2, "football quarterback touchdown stadium referee"),
            (3, "patient outcome football medical stadium dosage"),
        ],
        "doc_id long, text string",
    )
    w = {r["doc_id"]: r["dsir_weight"] for r in dsir_logratio_weights(pool, target).collect()}
    assert w[1] > w[3] > w[2]
    w2 = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_logratio_weights(pool.repartition(7), target).collect()
    }
    assert w == w2


def test_shared_span_pairs_exact_run(spark):
    # doc 1 and doc 2 share a verbatim 12-token run; doc 3 is unrelated
    run = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, f"intro words here {run} tail a b c"),
        (2, f"different opening {run} closing words x y"),
        (3, "completely unrelated text with no overlap at all whatsoever here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_childcare_spark.operators.dedup import shared_span_pairs

    got = shared_span_pairs(df, k=5, min_span_tokens=10).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # 12 shared tokens -> 8 shared 5-gram positions -> run of 8 -> 8+4
    assert r["longest_span_tokens"] == 12
    assert r["shared_positions"] == 8
    # raising the bar above the true span suppresses the pair
    assert shared_span_pairs(df, k=5, min_span_tokens=13).count() == 0


def test_shared_span_pairs_max_df_cap(spark):
    # a 5-gram present in ALL docs is boilerplate; max_df must drop it
    boiler = "shared boilerplate footer line here"
    rows = [(i, f"doc {i} body text number {i} {boiler}") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_childcare_spark.operators.dedup import shared_span_pairs

    uncapped = shared_span_pairs(df, k=5, min_span_tokens=5)
    capped = shared_span_pairs(df, k=5, min_span_tokens=5, max_df=3)
    assert uncapped.count() > 0
    assert capped.count() == 0


def test_doc_oov_rates_vocab_cut(spark):
    rows = [
        (1, "aa aa aa bb bb cc"),
        (2, "aa bb zz"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_childcare_spark.operators.tfidf import doc_oov_rates

    # vocab_size=2 -> vocab {aa, bb}; cc and zz are OOV
    got = {r["doc_id"]: r for r in doc_oov_rates(df, vocab_size=2).collect()}
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (6, 1)
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (3, 1)
    assert got[2]["oov_rate"] == pytest.approx(1 / 3, abs=1e-6)
    # zero-token doc keeps a row with rate 0.0
    assert (got[3]["n_tokens"], got[3]["n_oov"], got[3]["oov_rate"]) == (0, 0, 0.0)


def test_source_mixture_weights_uniform_and_explicit(spark):
    rows = [
        (1, "a b c d e f", "web"),
        (2, "a b c d e f", "web"),
        (3, "a b c d e f g h i j k l", "web"),
        (4, "a b c d e f g h", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    from data_pipeline_childcare_spark.operators.split import source_mixture_weights

    got = {r["source"]: r for r in source_mixture_weights(df).collect()}
    # web: 24 tokens of 32 -> share .75, uniform target .5 -> weight 2/3
    assert got["web"]["n_docs"] == 3 and got["web"]["n_tokens"] == 24
    assert got["web"]["token_share"] == pytest.approx(0.75, abs=1e-6)
    assert got["web"]["mix_weight"] == pytest.approx(0.5 / 0.75, abs=1e-4)
    assert got["books"]["mix_weight"] == pytest.approx(2.0, abs=1e-6)
    # explicit targets: wiki is absent from the corpus, so its 0.2
    # target mass is renormalized away — books' realizable target
    # becomes 0.8/0.8 = 1.0; web (not in the dict) is dropped
    exp = {
        r["source"]: r
        for r in source_mixture_weights(
            df, target_shares={"books": 0.8, "wiki": 0.2}
        ).collect()
    }
    assert exp["books"]["mix_weight"] == pytest.approx(1.0 / 0.25, abs=1e-4)
    assert exp["web"]["mix_weight"] == 0.0
    # an explicit dict covering every observed source with mass 1.0
    # is unaffected by renormalization
    exact = {
        r["source"]: r
        for r in source_mixture_weights(
            df, target_shares={"books": 0.25, "web": 0.75}
        ).collect()
    }
    assert exact["books"]["mix_weight"] == pytest.approx(0.25 / 0.25, abs=1e-4)
    assert exact["web"]["mix_weight"] == pytest.approx(0.75 / 0.75, abs=1e-4)


def test_source_overlap_matrix_canonical_pairs(spark):
    import __spark_entry__ as entry_mod

    rows = entry_mod.source_overlap_matrix(spark, "/root/testdata/sf0.001").collect()
    assert rows, "sf0.001 corpus has near-dup pairs; matrix must be non-empty"
    for r in rows:
        # unordered pair canonicalization and sane averages
        assert r["source_x"] <= r["source_y"]
        assert r["n_pairs"] >= 1
        assert 0.5 <= r["avg_est_jaccard"] <= 1.0
    # no duplicate cells
    cells = [(r["source_x"], r["source_y"]) for r in rows]
    assert len(cells) == len(set(cells))


def test_shared_span_pairs_excludes_sub_k_docs(spark):
    # empty and sub-k docs must produce NO phantom spans (a k-gram
    # index cannot attest any span for them), even at min_span == k
    rows = [(1, ""), (2, ""), (3, "ab cd"), (4, "ab cd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from data_pipeline_childcare_spark.operators.dedup import shared_span_pairs

    assert shared_span_pairs(df, k=5, min_span_tokens=5).count() == 0


def test_bigram_logprob_prefers_coherent_sequences(spark):
    """The bigram LM must separate what the unigram proxy cannot:
    two docs with IDENTICAL token multisets, one in the corpus'
    dominant order and one scrambled — the coherent one scores
    higher; and a short doc emits no row (no bigram positions)."""
    from data_pipeline_childcare_spark.operators.tfidf import bigram_logprob_scores

    coherent = "the quick brown fox " * 6
    scrambled = "quick the fox brown " * 6
    docs = spark.createDataFrame(
        [(1, coherent.strip()), (2, coherent.strip()), (3, coherent.strip()),
         (4, scrambled.strip()), (5, "single")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob_scores(docs).collect()}
    assert 5 not in got  # < 2 tokens → no bigram positions
    assert got[1]["n_bigrams"] == 23
    assert got[1]["avg_logprob"] > got[4]["avg_logprob"]


def test_linear_classifier_train_apply_loop(spark):
    """centroid_weights → linear_text_scores end-to-end: a model
    derived from labeled examples separates held-out docs of the two
    registers; zero-hit docs score the bias sigmoid."""
    from data_pipeline_childcare_spark.operators.classifier import (
        centroid_weights,
        linear_text_scores,
    )

    examples = spark.createDataFrame(
        [("pos", "science method experiment theory data analysis"),
         ("pos", "theory experiment science evidence data"),
         ("neg", "click buy now cheap deal offer sale"),
         ("neg", "free offer deal click sale now")],
        "label string, text string",
    )
    weights, bias = centroid_weights(examples)
    assert weights["science"] > 0 and weights["click"] < 0

    docs = spark.createDataFrame(
        [(1, "new experiment confirms theory with data"),
         (2, "cheap deal click now limited offer"),
         (3, "completely unrelated words zebra qux")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           linear_text_scores(docs, weights, bias).collect()}
    assert got[1]["positive"] is True and got[1]["score"] > 0.5
    assert got[2]["positive"] is False and got[2]["score"] < 0.5
    assert got[3]["n_hits"] == 0 and got[3]["score"] == 0.5  # sigmoid(bias=0)


def test_bpe_learning_textbook_case(spark):
    """Sennrich-style corpus: the learned merge order must be the
    classic l+o → lo+w → e+w → n+ew trajectory, and segment counts
    reflect the merged vocabulary."""
    from data_pipeline_childcare_spark.operators.bpe import (
        bpe_segment_counts,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new"),
         (3, "low new lower newer")],
        "doc_id long, text string",
    )
    merges = [(r["left"], r["right"], r["merged"], r["pair_count"])
              for r in learn_bpe_merges(docs, n_merges=5).orderBy("round").collect()]
    assert merges[:4] == [
        ("l", "o", "lo", 7), ("lo", "w", "low", 7),
        ("e", "w", "ew", 6), ("n", "ew", "new", 6),
    ]
    got = {r["doc_id"]: (r["n_words"], r["n_symbols"])
           for r in bpe_segment_counts(docs, n_merges=5).collect()}
    # doc1: low(1) + low,er(2) + low,e,s,t(4) + low(1) + low(1) = 9
    assert got[1] == (5, 9)


def test_temperature_mixture_flattens_toward_uniform(spark):
    """α=1 keeps the natural mixture (weights 1.0); smaller α
    up-samples the minority source and down-samples the giant, with
    target shares summing to 1."""
    from data_pipeline_childcare_spark.operators.split import (
        temperature_mixture_weights,
    )

    docs = spark.createDataFrame(
        [(i, "tok " * 99 + "tok", "big") for i in range(9)]
        + [(100, "tok " * 99 + "tok", "small")],
        "doc_id long, text string, source string",
    )
    nat = {r["source"]: r for r in temperature_mixture_weights(docs, alpha=1.0).collect()}
    assert nat["big"]["mix_weight"] == 1.0 and nat["small"]["mix_weight"] == 1.0
    cool = {r["source"]: r for r in temperature_mixture_weights(docs, alpha=0.5).collect()}
    assert cool["small"]["mix_weight"] > 1.0 > cool["big"]["mix_weight"]
    assert abs(cool["big"]["target_share"] + cool["small"]["target_share"] - 1.0) < 1e-5


def test_temperature_mixture_tiny_source_finite(spark):
    """A source whose token share rounds to 0 at ndigits must still get
    a finite mix_weight (the clamp divides by one ulp of the rounding
    grid instead of the rounded-to-zero share)."""
    import math

    from data_pipeline_childcare_spark.operators.split import (
        temperature_mixture_weights,
    )

    docs = spark.createDataFrame(
        [(0, "tok " * 4_000_000, "giant"), (1, "tok", "speck")],
        "doc_id long, text string, source string",
    )
    rows = {
        r["source"]: r
        for r in temperature_mixture_weights(docs, alpha=0.5, ndigits=6).collect()
    }
    w = rows["speck"]["mix_weight"]
    assert w is not None and math.isfinite(w) and w > 1.0


def test_wordpiece_greedy_semantics_and_unk(spark):
    """WordPiece trainer + application, hand-checkable corpus:
    alphabet always retained, greedy longest-match wins over shorter
    pieces, over-length words excluded from training and counted as
    one [UNK] at application."""
    from data_pipeline_childcare_spark.operators.wordpiece import (
        learn_wordpiece_vocab,
        wordpiece_segment_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "banana bandana banana"),
            (2, "ban dan ana banana"),
            (3, "a wordwaypastthesixteencharcap x"),
        ],
        "doc_id long, text string",
    )
    vocab = {
        r["piece"]: r
        for r in learn_wordpiece_vocab(
            docs, vocab_size=12, n_rounds=2, max_piece_len=4
        ).collect()
    }
    # alphabet coverage: every char of every trainable word survives
    for ch in "bandx":
        assert ch in vocab or any(ch in p for p in vocab if len(p) > 1)
    # the dominant substring is learned as a multi-char piece
    assert "bana" in vocab and not vocab["bana"]["is_char"]
    # rank 1 = highest weighted count, ties broken by piece asc
    ranked = sorted(vocab.values(), key=lambda r: r["rank"])
    counts = [r["weighted_count"] for r in ranked]
    assert counts == sorted(counts, reverse=True)

    fert = {
        r["doc_id"]: r
        for r in wordpiece_segment_counts(
            docs, vocab_size=12, n_rounds=2, max_piece_len=4
        ).collect()
    }
    # banana -> bana+na (2), bandana -> ban+d+ana (3): doc1 = 2+3+2
    assert fert[1]["n_words"] == 3 and fert[1]["n_pieces"] == 7
    assert fert[1]["n_unk"] == 0
    # doc3: 'a' (1 piece) + over-length word (1 UNK) + 'x' (1 piece)
    assert fert[3]["n_words"] == 3
    assert fert[3]["n_pieces"] == 3 and fert[3]["n_unk"] == 1


def test_wordpiece_model_collect_guard(spark):
    """A corpus-sized piece frame must fail loudly, never silently
    stream onto the driver (the guarded model-collect contract)."""
    import pytest as _pytest

    from data_pipeline_childcare_spark.operators import wordpiece as wp

    big = spark.range(wp._MAX_MODEL_ROWS + 10).selectExpr(
        "cast(id as string) AS piece"
    )
    with _pytest.raises(ValueError, match="model-sized"):
        wp._collect_pieces(big, "test frame")


def test_train_logreg_separable_corpus(spark):
    """In-engine LR training: on a linearly separable toy corpus the
    learned weights point the right way, train accuracy is 1.0
    through the apply path, and the trajectory is deterministic
    across repartitioning (pre-rounded arithmetic)."""
    from data_pipeline_childcare_spark.operators.classifier import (
        linear_text_scores,
        train_logreg_weights,
    )

    docs = spark.createDataFrame(
        [(i, "cat cats purr feline cat", 1) for i in range(6)]
        + [(10 + i, "stock market ticker price stock", 0) for i in range(6)],
        "doc_id long, text string, label int",
    )
    w1 = {
        r["token"]: r["weight"]
        for r in train_logreg_weights(docs, n_iters=3, vocab_size=16).collect()
    }
    assert w1["cat"] > 0 > w1["stock"]
    weights = {t: v for t, v in w1.items() if t != "__bias__"}
    scored = linear_text_scores(docs, weights, bias=w1["__bias__"]).collect()
    assert all((r["score"] >= 0.5) == (r["doc_id"] < 10) for r in scored)
    # partitioning-invariant trajectory
    w2 = {
        r["token"]: r["weight"]
        for r in train_logreg_weights(
            docs.repartition(7), n_iters=3, vocab_size=16
        ).collect()
    }
    assert w1 == w2


def test_trigram_backoff_tiers(spark):
    """Stupid backoff hits all three tiers: a train-seen trigram
    scores c3/c(ctx); an unseen trigram with a seen backoff bigram
    scores alpha*c(bg)/c(w2); a fully novel continuation takes the
    alpha^2 unigram tier with the OOV half-count floor; and a
    2-token doc emits no row."""
    import math

    from data_pipeline_childcare_spark.operators.tfidf import trigram_backoff_scores

    train = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c"), (3, "x b c"), (4, "b c z"), (5, "a b")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in trigram_backoff_scores(docs, train).collect()}
    assert 5 not in got  # < 3 tokens -> no trigram positions
    # tier 1: c("a b c")=2 / c("a b")=2 = 1.0
    assert got[2]["n_trigrams"] == 1
    assert got[2]["avg_logprob"] == 0.0
    # tier 2: 0.4 * c("b c")=2 / c("b")=2 = 0.4
    assert got[3]["avg_logprob"] == round(math.log10(0.4), 6)
    # tier 3: 0.4^2 * 0.5(OOV floor) / N=6
    assert got[4]["avg_logprob"] == round(math.log10(0.4 * 0.4 * (0.5 / 6)), 6)
    # tiers are ordered: exact match > backoff > novel
    assert got[2]["avg_logprob"] > got[3]["avg_logprob"] > got[4]["avg_logprob"]


def test_bm25_topk_ranking_semantics(spark):
    """BM25 must (a) rank exact-term-matching docs above non-matching,
    (b) reward rarer matching terms over stopword matches via idf,
    (c) penalize term-stuffed long docs via length normalization, and
    (d) respect the k cut with deterministic tie-breaks."""
    from data_pipeline_childcare_spark.operators.tfidf import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "rust compiler design"),        # both query terms, short
            (2, "rust rust rust rust rust rust rust rust filler filler "
                "filler filler filler filler filler filler"),  # stuffed+long
            (3, "compiler theory the the"),     # one rare term
            (4, "the the the the"),             # stopwords only
            (5, "gardening tips"),              # no overlap
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(100, "rust compiler")], "query_id long, qtext string")
    got = bm25_topk(docs, q, k=3).collect()
    order = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order[0] == 1  # both terms beat any single-term doc
    assert 5 not in order and 4 not in order
    assert len(order) == 3
    scores = {r["doc_id"]: r["score"] for r in got}
    assert scores[1] > scores[3] > 0
    # doc 2 has tf=7 of 'rust' but length-normalization caps the gain:
    # it must not outrank the doc matching BOTH terms
    assert scores[1] > scores[2]


def test_bm25_topk_max_df_drops_stopword_postings(spark):
    """max_df removes ultra-common terms from the index side: queries
    made only of dropped terms retrieve nothing."""
    from data_pipeline_childcare_spark.operators.tfidf import bm25_topk

    docs = spark.createDataFrame(
        [(i, "common filler" if i else "common rare") for i in range(6)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(1, "common"), (2, "rare")], "query_id long, qtext string"
    )
    got = bm25_topk(docs, q, k=5, max_df=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert 1 not in by_q          # 'common' is in all 6 docs -> dropped
    assert by_q[2] == [0]         # 'rare' only in doc 0


def test_perplexity_buckets_equal_depth_and_order(spark):
    """ntile(3) per domain: equal-depth buckets (sizes differ by ≤1),
    head holds the HIGHEST avg_logprob (lowest perplexity), and the
    bucketing is deterministic under repartitioning."""
    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.operators.tfidf import perplexity_buckets

    rows = [
        (i, "web" if i < 7 else "books", float(-i))  # score strictly ranks by id
        for i in range(12)
    ]
    scored = spark.createDataFrame(rows, "doc_id: long, source: string, avg_logprob: double")
    out = perplexity_buckets(scored).collect()
    by_doc = {r.doc_id: (r.bucket, r.bucket_name) for r in out}
    # web: 7 docs → buckets of 3/2/2 in score order (doc 0 best)
    assert [by_doc[i] for i in range(7)] == [
        (1, "head"), (1, "head"), (1, "head"),
        (2, "middle"), (2, "middle"),
        (3, "tail"), (3, "tail"),
    ]
    # books: 5 docs → 2/2/1
    assert [by_doc[i] for i in range(7, 12)] == [
        (1, "head"), (1, "head"), (2, "middle"), (2, "middle"), (3, "tail"),
    ]
    again = {
        r.doc_id: (r.bucket, r.bucket_name)
        for r in perplexity_buckets(scored.repartition(5)).collect()
    }
    assert again == by_doc


def test_pack_audit_layout_derived_bins(spark):
    from data_pipeline_childcare_spark.operators.packing import pack_audit

    # zero-token doc parked exactly on the next bin boundary must NOT
    # inflate n_bins (it occupies no window)
    packed = spark.createDataFrame(
        [(1, 0, 10, 0, 0), (2, 0, 0, 1, 0)],
        "doc_id long, shard long, n_tokens long, bin_id long, bin_offset long",
    )
    got = pack_audit(packed, seq_len=10).collect()[0]
    assert (got.n_bins, got.tail_waste, got.fill_ppm) == (1, 0, 1_000_000)

    # n_bins is derived from the LAYOUT, not ceil(total/seq_len): a
    # gappy/corrupted layout (doc parked at bin 5 with only 4 tokens
    # in the stream) surfaces as n_bins=6 and a huge tail_waste —
    # ceil-from-total would have hidden it as a clean 1-bin stream.
    bad = spark.createDataFrame(
        [(1, 0, 4, 5, 0)],
        "doc_id long, shard long, n_tokens long, bin_id long, bin_offset long",
    )
    g2 = pack_audit(bad, seq_len=10).collect()[0]
    assert g2.n_bins == 6
    assert g2.tail_waste == 56
