"""Distributed unigram-LM tokenizer training (SentencePiece's model;
Kudo 2018, "Subword regularization") — hard-EM: Viterbi-segment the
word vocabulary under the current piece costs, re-estimate costs from
usage, prune to the target inventory. Completes the engine's
tokenizer family: BPE learns a MERGE TABLE bottom-up
(operators/bpe.py), WordPiece re-scores a piece inventory under
GREEDY inference (operators/wordpiece.py), unigram-LM segments by
GLOBAL likelihood — the Viterbi DP finds the min-cost segmentation,
not the leftmost-longest one.

Simplifications vs full SentencePiece, stated plainly: hard EM
(Viterbi counts, not forward-backward expectations) and usage-count
pruning (not EM-loss pruning); add-one smoothing keeps never-emitted
alphabet pieces finite. The E→M trajectory, the DP and the inventory
discipline are the real algorithm.

Scale properties (the BPE/WordPiece discipline):
- ONE corpus-sized pass (word-frequency aggregate); every round then
  runs on the frequency-weighted WORD VOCABULARY.
- The cost table is MODEL-sized: collected behind the guarded
  model-collect contract and re-entering the plan as a LITERAL MAP —
  Viterbi is pure whole-stage-codegen column math, zero joins, zero
  UDFs, unrolled ``max_word_len`` positions with per-step
  ``withColumns`` projections (nested trees compound exponentially —
  the measured WordPiece lesson).

Determinism / oracle: piece costs are INTEGER micro-logs —
``floor((log10(total + V) − log10(c + 1)) · 1e6 + 0.5)`` — so the
entire DP is BIGINT arithmetic: bit-exact under any partitioning and
engine, no float ties anywhere (the fixed-point PageRank discipline).
Tie-break: equal path cost prefers the LONGER piece (encoded in the
low 3 bits of the packed comparison key). The DuckDB twin unrolls the
identical seed → cost → Viterbi → recount → prune trajectory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.operators.wordpiece import (
    _collect_pieces,
    _word_freqs,
)

# unreachable-path sentinel: far above any real path cost
# (max_word_len · max piece cost ≈ 8 · 8e6) yet safe under the ×8
# packing and a few additions
_BIG = 1 << 50


def _collect_costs(df: DataFrame, what: str) -> list[tuple[str, int]]:
    """Guarded model-collect of a (piece, cost) frame."""
    rows = df.limit(200_001).collect()
    if len(rows) > 200_000:
        raise ValueError(
            f"{what} exceeds 200000 rows — the cost table is "
            "model-sized by contract, not a corpus"
        )
    return [(r[0], r[1]) for r in rows]


def _cost_frame(counts: DataFrame, inventory_df: DataFrame) -> DataFrame:
    """(piece, weighted_count, cost) for every INVENTORY piece.

    Add-one smoothing over the inventory: cost =
    floor((log10(total + V) − log10(c + 1)) · 1e6 + 0.5) with total =
    Σ counts over inventory pieces and V = |inventory| — integral,
    positive, and defined for never-emitted alphabet pieces (c = 0).
    floor(x + 0.5) instead of round() pins the same half-up semantics
    in every engine (round() is half-even in some, half-away in
    others).
    """
    inv_counts = inventory_df.join(counts, "piece", "left").select(
        "piece", F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c")
    )
    totals = inv_counts.agg(
        F.sum("c").alias("_total"), F.count(F.lit(1)).alias("_v")
    )
    return inv_counts.join(F.broadcast(totals)).select(
        "piece",
        F.col("c").alias("weighted_count"),
        F.floor(
            (F.log10(F.col("_total") + F.col("_v")) - F.log10(F.col("c") + 1))
            * F.lit(1_000_000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cost"),
    )


def _viterbi_segment(
    words: DataFrame,
    costs: list[tuple[str, int]],
    max_word_len: int,
    max_piece_len: int,
    word_col: str = "w",
    out_col: str = "pieces",
) -> DataFrame:
    """Min-cost segmentation of every word under the literal cost
    map — forward DP unrolled ``max_word_len`` positions, then the
    backtrace unrolled the same depth with CASE ladders over the
    backpointer columns. All BIGINT.

    Packing: a candidate at position i via piece length L packs to
    ``(cost_so_far + piece_cost) · 8 + (max_piece_len − L)`` — the
    min simultaneously picks the cheapest path and, on exact cost
    ties, the longest piece. Unreachable candidates coalesce to the
    ``_BIG`` sentinel instead of NULL so ``least`` semantics never
    depend on engine NULL handling.
    """
    cost_map = F.create_map(
        *[F.lit(x) for pair in sorted(costs) for x in pair]
    )
    word = F.col(word_col)
    df = words.withColumn("_cm", cost_map).withColumn(
        "_c_0", F.lit(0).cast("long")
    )
    for i in range(1, max_word_len + 1):
        cands = []
        for plen in range(1, min(max_piece_len, i) + 1):
            sub = F.substring(word, i - plen + 1, plen)
            pc = F.try_element_at(F.col("_cm"), sub)
            comb = (
                (F.col(f"_c_{i - plen}") + pc) * 8 + (max_piece_len - plen)
            )
            cands.append(F.coalesce(comb, F.lit(_BIG)))
        best = cands[0] if len(cands) == 1 else F.least(*cands)
        df = df.withColumns({f"_m_{i}": best}).withColumns(
            {
                f"_c_{i}": F.expr(f"_m_{i} div 8"),
                f"_bp_{i}": (
                    F.lit(max_piece_len) - F.col(f"_m_{i}") % 8
                ).cast("int"),
            }
        )
    # backtrace
    def bp_at(pos: Column) -> Column:
        out = F.lit(None).cast("int")
        for i in range(1, max_word_len + 1):
            out = F.when(pos == i, F.col(f"_bp_{i}")).otherwise(out)
        return out

    df = df.withColumn("_pos_0", F.length(word))
    piece_cols = []
    for j in range(1, max_word_len + 1):
        prev = F.col(f"_pos_{j - 1}")
        bp = bp_at(prev)
        pc = f"_q_{j}"
        df = df.withColumns(
            {pc: F.when(prev > 0, F.substring(word, prev - bp + 1, bp))}
        ).withColumn(f"_pos_{j}", F.greatest(prev - F.coalesce(bp, F.lit(0)), F.lit(0)))
        piece_cols.append(pc)
    arr = F.reverse(
        F.filter(F.array(*[F.col(c) for c in piece_cols]), lambda p: p.isNotNull())
    )
    drop = (
        ["_cm"]
        + [f"_c_{i}" for i in range(max_word_len + 1)]
        + [f"_m_{i}" for i in range(1, max_word_len + 1)]
        + [f"_bp_{i}" for i in range(1, max_word_len + 1)]
        + [f"_pos_{j}" for j in range(max_word_len + 1)]
        + piece_cols
    )
    return df.withColumn(out_col, arr).drop(*drop)


def learn_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 48,
    n_rounds: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram inventory → (piece, piece_len,
    weighted_count, cost_micro, rank, is_char).

    Trajectory: substring counts (len 1..max_piece_len, weighted by
    word freq) seed the inventory (full alphabet + top multi-char by
    (count DESC, piece ASC)); each round Viterbi-segments the word
    vocabulary under the current integer costs, recounts usage,
    re-prunes and re-costs. Words longer than ``max_word_len`` are
    excluded from training (the WordPiece cap discipline).
    """
    spark = docs.sparkSession
    words = _word_freqs(docs, id_col, text_col, max_word_len)

    def _subs_of(plen: int):
        def mk(i):
            return F.col("w").substr(i, F.lit(plen))

        return F.when(
            F.length("w") >= plen,
            F.transform(F.sequence(F.lit(1), F.length("w") - (plen - 1)), mk),
        ).otherwise(F.array().cast("array<string>"))

    subs = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.array(*[_subs_of(plen) for plen in range(1, max_piece_len + 1)])
            )
        ).alias("piece"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").cast("long").alias("c"))
    alphabet = sorted(
        _collect_pieces(
            counts.filter(F.length("piece") == 1).select("piece"), "alphabet"
        )
    )
    n_multi = max(vocab_size - len(alphabet), 0)

    def inventory_df(cnts: DataFrame) -> DataFrame:
        top = (
            cnts.filter(F.length("piece") >= 2)
            .orderBy(F.desc("c"), F.asc("piece"))
            .limit(n_multi)
            .select("piece")
        )
        alpha = spark.createDataFrame([(p,) for p in alphabet], "piece string")
        return alpha.unionByName(top)

    inv = inventory_df(counts)
    cost_f = _cost_frame(counts, inv)
    for _ in range(n_rounds):
        costs = _collect_costs(cost_f.select("piece", "cost"), "unigram cost table")
        segs = _viterbi_segment(words, costs, max_word_len, max_piece_len)
        counts = (
            segs.select("freq", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("c"))
        )
        inv = inventory_df(counts)
        cost_f = _cost_frame(counts, inv)

    from pyspark.sql import Window as W

    # global by design over the vocab_size-row inventory
    w = W.partitionBy(F.lit(0)).orderBy(
        F.desc("weighted_count"), F.asc("piece")
    )
    return cost_f.select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        "weighted_count",
        F.col("cost").alias("cost_micro"),
        F.row_number().over(w).cast("int").alias("rank"),
        (F.length("piece") == 1).alias("is_char"),
    )


def unigram_segment_counts(
    docs: DataFrame,
    vocab: DataFrame | list[tuple[str, int]],
    max_piece_len: int = 4,
    max_word_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained inventory: per doc, Viterbi piece count /
    word count / unk count (words over ``max_word_len`` count one
    UNK, the training-side cap). ``vocab`` is the (piece, cost_micro)
    frame from :func:`learn_unigram_lm` or a literal list."""
    if isinstance(vocab, DataFrame):
        costs = _collect_costs(
            vocab.select("piece", "cost_micro"), "unigram cost table"
        )
    else:
        costs = list(vocab)
    from data_pipeline_childcare_spark.functions.text import tokenize
    from data_pipeline_childcare_spark.io import spread_partitions

    toks = (
        spread_partitions(docs, id_col)
        .select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
    )
    ok = toks.filter(F.length("w") <= max_word_len)
    seg = _viterbi_segment(ok, costs, max_word_len, max_piece_len)
    per_word = seg.select(
        id_col,
        F.size("pieces").cast("long").alias("np"),
        F.lit(0).cast("long").alias("unk"),
    )
    over = toks.filter(F.length("w") > max_word_len).select(
        F.col(id_col),
        F.lit(1).cast("long").alias("np"),
        F.lit(1).cast("long").alias("unk"),
    )
    return (
        per_word.unionByName(over)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("np").alias("n_pieces"),
            F.sum("unk").alias("n_unk"),
        )
    )
