"""Binary-classifier evaluation metrics — the measurement half of the
quality-filter loop. The engine trains and applies corpus filters
(`operators/classifier.py`, `doc_quality_gate`; reference retrieve.py
tunes rerank quality by hand) but until now nothing measured them.
Companion to `operators/raneval.py` (ranking metrics): this module
evaluates *pointwise* binary classifiers — confusion counts,
accuracy/precision/recall/F1, ROC-AUC, Brier score, and a reliability
(calibration) table.

Scale design
------------
Every metric reduces through ONE ``groupBy(score_u)`` aggregate over
the scored corpus. Scores are integer micros, so the group table has
≤ 1e6+1 rows regardless of corpus size; the ordered window ROC-AUC
needs (cumulative counts below each score) runs over that small table
— never a global sort of the row set. The 100 TB plan is: map-side
partial aggregate → one exchange on ``score_u`` → tiny-table windows
and a final single-row reduce. No UDFs anywhere.

Determinism (the fixed-point discipline)
----------------------------------------
All ratios are integer micros via BIGINT floor division (``x div y``,
the same convention as `raneval.py` / `pagerank`), bit-exact across
engines and partitionings. ROC-AUC is the Mann-Whitney U statistic
with average ranks for ties, kept integral by working with
``min_rank + max_rank`` (twice the average rank):

    AUC = (S2 - n1*(n1+1)) / (2*n1*n0)
    S2  = sum over positives of (min_rank + max_rank)

``S2`` and the Brier numerator are O(n²)- and O(n·1e12)-sized, so both
accumulate in DECIMAL(38,0) (Spark decimal sums are exact; the DuckDB
twins sum into HUGEINT) — overflow-free past 1e15 rows — and only the
final ``div`` (quotient ≤ 1e6) lands back in BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000


def _score_groups(
    scored: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """ONE corpus aggregate: per distinct score-micro value, the row
    count and positive count. Everything downstream is sized by the
    number of distinct scores (≤ 1e6+1), not the corpus."""
    y = F.when(F.col(label_col).cast("boolean"), F.lit(1)).otherwise(F.lit(0))
    return (
        scored.select(
            F.floor(F.col(score_col) * MICRO + F.lit(0.5))
            .cast("long")
            .alias("score_u"),
            y.alias("y"),
        )
        .groupBy("score_u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
        )
    )


def binary_eval_summary(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    threshold: float = 0.5,
) -> DataFrame:
    """One-row corpus summary of a scored binary classifier.

    Columns: n, n_pos, n_neg, tp, fp, tn, fn (BIGINT counts at the
    threshold — predicted positive iff ``score_u >= threshold_u``),
    then accuracy_u / precision_u / recall_u / f1_u / auc_u / brier_u
    as integer micros (precision/F1 null when nothing is predicted
    positive, AUC null when a class is empty).

    F1 comes from counts as ``2·tp div (2·tp + fp + fn)`` — one exact
    division, not a composition of two already-floored ratios.
    """
    thr_u = int(round(threshold * MICRO))
    groups = _score_groups(scored, label_col, score_col)

    # Cumulative count strictly below each score: ordered window over
    # the distinct-score table (partitionBy(lit(0)) — WindowExec
    # hygiene; the frame is group-table-sized by construction).
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("score_u")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = groups.select(
        "*",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("cum_before"),
    )
    pred_pos = F.col("score_u") >= F.lit(thr_u)
    big = "decimal(38,0)"
    agg = rk.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.sum(F.when(pred_pos, F.col("n_pos")).otherwise(F.lit(0)))
        .cast("long").alias("tp"),
        F.sum(F.when(pred_pos, F.col("n") - F.col("n_pos")).otherwise(F.lit(0)))
        .cast("long").alias("fp"),
        F.sum(F.when(~pred_pos, F.col("n") - F.col("n_pos")).otherwise(F.lit(0)))
        .cast("long").alias("tn"),
        F.sum(F.when(~pred_pos, F.col("n_pos")).otherwise(F.lit(0)))
        .cast("long").alias("fn"),
        # S2 = Σ_positives (min_rank + max_rank), exact in decimal.
        F.sum(
            (F.col("n_pos") * (2 * F.col("cum_before") + F.col("n") + 1)).cast(big)
        ).cast(big).alias("s2"),
        # Brier numerator: rows sharing a score share the term.
        F.sum(
            (
                F.col("n_pos")
                * (F.col("score_u") - MICRO) * (F.col("score_u") - MICRO)
                + (F.col("n") - F.col("n_pos")) * F.col("score_u") * F.col("score_u")
            ).cast(big)
        ).cast(big).alias("brier_num"),
    )
    return agg.select(
        "n", "n_pos", "n_neg", "tp", "fp", "tn", "fn",
        F.expr(f"(tp + tn) * {MICRO} div n").alias("accuracy_u"),
        F.expr(
            f"CASE WHEN tp + fp > 0 THEN tp * {MICRO} div (tp + fp) END"
        ).alias("precision_u"),
        F.expr(
            f"CASE WHEN n_pos > 0 THEN tp * {MICRO} div n_pos END"
        ).alias("recall_u"),
        F.expr(
            f"CASE WHEN 2*tp + fp + fn > 0 THEN 2 * tp * {MICRO} div (2*tp + fp + fn) END"
        ).alias("f1_u"),
        F.expr(
            f"CASE WHEN n_pos > 0 AND n_neg > 0 THEN "
            f"(s2 - cast(n_pos as {big}) * (n_pos + 1)) * {MICRO} "
            f"div (cast(2 as {big}) * n_pos * n_neg) END"
        ).cast("long").alias("auc_u"),
        # brier = brier_num / (n · MICRO²) → micros: div by n·MICRO.
        F.expr(f"brier_num div (cast(n as {big}) * {MICRO})")
        .cast("long").alias("brier_u"),
    )


def pr_curve(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Operating-characteristic sweep: one row per DISTINCT score
    value, treating that score as the inclusive decision threshold →
    (threshold_u, tp, fp, fn, precision_u, recall_u, f1_u). The
    precision-recall curve a team reads to pick the gate threshold
    (argmax f1_u, or the knee at a recall floor).

    Same scale shape as the rest of the module: the corpus reduces
    through ONE groupBy(score_u) aggregate; the threshold sweep is a
    descending cumulative window over the ≤1e6-row distinct-score
    table, so every possible threshold is evaluated in one pass —
    no per-threshold re-scan, no parameter grid.
    """
    groups = _score_groups(scored, label_col, score_col)
    # Inclusive-threshold cumulative counts: tp(t) = positives with
    # score_u >= t, fp(t) likewise for negatives.
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy(F.desc("score_u"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = groups.select(
        F.col("score_u").alias("threshold_u"),
        F.sum("n_pos").over(w).cast("long").alias("tp"),
        F.sum(F.col("n") - F.col("n_pos")).over(w).cast("long").alias("fp"),
    )
    total_pos = groups.agg(F.sum("n_pos").cast("long").alias("_n1"))
    cum = cum.crossJoin(F.broadcast(total_pos))
    return cum.select(
        "threshold_u", "tp", "fp",
        (F.col("_n1") - F.col("tp")).cast("long").alias("fn"),
        F.expr(f"tp * {MICRO} div (tp + fp)").alias("precision_u"),
        F.expr(
            f"CASE WHEN _n1 > 0 THEN tp * {MICRO} div _n1 END"
        ).alias("recall_u"),
        F.expr(
            f"CASE WHEN 2*tp + fp + (_n1 - tp) > 0 THEN "
            f"2 * tp * {MICRO} div (2*tp + fp + (_n1 - tp)) END"
        ).alias("f1_u"),
    ).orderBy("threshold_u")


def calibration_bins(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table: equal-width score bins → (bin, n, n_pos,
    mean_score_u, frac_pos_u). A calibrated classifier has
    ``mean_score_u ≈ frac_pos_u`` per bin. Same single-aggregate
    scale shape as the summary; a score of exactly 1.0 folds into the
    top bin. Means are floor-division micros (the repo's floor-mean
    convention)."""
    groups = _score_groups(scored, label_col, score_col)
    bin_col = F.least(
        F.expr(f"score_u * {n_bins} div {MICRO}"),
        F.lit(n_bins - 1).cast("long"),
    ).alias("bin")
    agg = groups.groupBy(bin_col).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("n_pos").cast("long").alias("n_pos"),
        F.sum((F.col("score_u") * F.col("n")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("score_sum"),
    )
    return agg.select(
        "bin", "n", "n_pos",
        F.expr("score_sum div cast(n as decimal(38,0))")
        .cast("long").alias("mean_score_u"),
        F.expr(f"n_pos * {MICRO} div n").alias("frac_pos_u"),
    ).orderBy("bin")


def gini_stump(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Train a depth-1 CART stump in-engine, exactly: pick the score
    threshold minimizing weighted child Gini impurity → one row
    (n, n_pos, parent_gini_u, best_threshold_u, left_n, left_pos,
    right_n, right_pos, child_gini_u, gain_u). The training half of
    the measurement family (``binary_eval_summary`` scores a GIVEN
    threshold; this FINDS the optimal one by impurity).

    Why Gini and not entropy: Gini is RATIONAL — the weighted child
    impurity is
    ``[(tL²−pL²−nL²)·tR + (tR²−pR²−nR²)·tL] / (tL·tR·T)`` — so the
    argmin is exact integer arithmetic in DECIMAL(38,0)/HUGEINT
    micros (entropy's logs would need cross-engine float discipline).
    Candidate thresholds are every distinct score (left = score <
    t, right = score ≥ t; empty-left candidates skipped); ties in
    impurity break to the smallest threshold.

    Scale shape: the claseval discipline — ONE groupBy(score_u)
    corpus aggregate, then all candidate evaluation on the
    distinct-score frame (≤ 1e6+1 rows) with one ordered window."""
    groups = _score_groups(scored, label_col, score_col)
    w = Window.partitionBy(F.lit(0)).orderBy("score_u")
    w_all = Window.partitionBy(F.lit(0)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    big = "decimal(38,0)"
    cum = groups.select(
        "score_u",
        F.coalesce(
            F.sum(F.col("n").cast(big)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast(big),
        ).alias("tl"),
        F.coalesce(
            F.sum(F.col("n_pos").cast(big)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast(big),
        ).alias("pl"),
        F.sum(F.col("n").cast(big)).over(w_all).alias("t"),
        F.sum(F.col("n_pos").cast(big)).over(w_all).alias("p"),
    )
    cand = (
        cum.filter(F.col("tl") > 0)
        .withColumn("nl", F.col("tl") - F.col("pl"))
        .withColumn("tr", F.col("t") - F.col("tl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .withColumn("nr", F.col("tr") - F.col("pr"))
        .withColumn(
            "child_gini_u",
            F.expr(
                "cast(((tl * tl - pl * pl - nl * nl) * tr"
                " + (tr * tr - pr * pr - nr * nr) * tl) * 1000000"
                " div (tl * tr * t) as bigint)"
            ),
        )
    )
    best = cand.orderBy(F.asc("child_gini_u"), F.asc("score_u")).limit(1)
    return best.select(
        F.col("t").cast("long").alias("n"),
        F.col("p").cast("long").alias("n_pos"),
        F.expr(
            "cast((t * t - p * p - (t - p) * (t - p)) * 1000000 div (t * t) as bigint)"
        ).alias("parent_gini_u"),
        F.col("score_u").alias("best_threshold_u"),
        F.col("tl").cast("long").alias("left_n"),
        F.col("pl").cast("long").alias("left_pos"),
        F.col("tr").cast("long").alias("right_n"),
        F.col("pr").cast("long").alias("right_pos"),
        "child_gini_u",
        (
            F.expr(
                "cast((t * t - p * p - (t - p) * (t - p)) * 1000000 div (t * t) as bigint)"
            )
            - F.col("child_gini_u")
        ).alias("gain_u"),
    )


def chi_square_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson χ² test of independence over a contingency table →
    one row (n, n_rows, n_cols, dof, chi2_u): the A/B-test /
    feature-association workhorse. The statistic is computed in the
    all-integer form ``Σ (O·N − r·c)² / (N·r·c)`` — per-cell
    floor-micro terms summed (deterministic and engine-identical;
    the per-cell floor is the documented quantization). No p-value
    column by design: the χ² CDF needs transcendental math — compare
    chi2_u against the critical value for ``dof`` client-side.

    Shape: one (row, col) keyed aggregate (map-side combinable), two
    marginal re-aggregations of the CELL frame (category-vocabulary
    sized), broadcast joins back. DECIMAL(38,0) products — bounds:
    exact while O·N ≲ 1e16 (documented)."""
    cells = df.groupBy(
        F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
    ).agg(F.count(F.lit(1)).cast("long").alias("_o"))
    rows = cells.groupBy("_r").agg(F.sum("_o").cast("long").alias("_rt"))
    cols = cells.groupBy("_c").agg(F.sum("_o").cast("long").alias("_ct"))
    tot = cells.agg(
        F.sum("_o").cast("long").alias("_n"),
        F.count_distinct("_r").cast("long").alias("n_rows"),
        F.count_distinct("_c").cast("long").alias("n_cols"),
    )
    big = "decimal(38,0)"
    full = (
        rows.crossJoin(cols)
        .join(cells, on=["_r", "_c"], how="left")
        .crossJoin(F.broadcast(tot))
        .select(
            "_n",
            "n_rows",
            "n_cols",
            F.coalesce("_o", F.lit(0)).cast(big).alias("o"),
            F.col("_rt").cast(big).alias("rt"),
            F.col("_ct").cast(big).alias("ct"),
            F.col("_n").cast(big).alias("nn"),
        )
        .withColumn(
            "_term",
            F.expr(
                "cast((o * nn - rt * ct) * (o * nn - rt * ct) * 1000000"
                " div (nn * rt * ct) as bigint)"
            ),
        )
    )
    return full.groupBy("_n", "n_rows", "n_cols").agg(
        F.sum("_term").cast("long").alias("chi2_u")
    ).select(
        F.col("_n").alias("n"),
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1)).cast("long").alias("dof"),
        "chi2_u",
    )


def gini_stump_cv(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    id_col: str = "doc_id",
    n_folds: int = 5,
) -> DataFrame:
    """K-fold cross-validated decision stump → one row per fold:
    (fold, threshold_u, left_label, right_label, oof_n, oof_correct,
    oof_acc_u) — in-engine MODEL SELECTION: each fold's stump trains
    on the other k−1 folds (threshold = argmin weighted child Gini,
    leaf labels = training majority per side, ties → negative) and
    is scored on its held-out fold. The out-of-fold accuracies are
    the honest generalization estimate a deployment reads.

    Shape: ONE (fold, score_u) corpus aggregate; every fold's
    TRAINING counts derive by subtraction (total-per-score minus the
    fold's own counts — no per-fold rescan); candidate evaluation,
    argmin and leaf orientation all run on the (folds ×
    distinct-scores)-sized frame; the OOF join is fold-keyed. Exact
    DECIMAL(38,0)/HUGEINT integers throughout (the gini_stump
    discipline); folds are ``id mod n_folds`` — deterministic."""
    y = F.when(F.col(label_col).cast("boolean"), F.lit(1)).otherwise(F.lit(0))
    big = "decimal(38,0)"
    g = (
        scored.select(
            (F.col(id_col) % n_folds).cast("int").alias("fold"),
            F.floor(F.col(score_col) * MICRO + F.lit(0.5))
            .cast("long")
            .alias("score_u"),
            y.alias("_y"),
        )
        .groupBy("fold", "score_u")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_f"),
            F.sum("_y").cast("long").alias("p_f"),
        )
    )
    tot = g.groupBy("score_u").agg(
        F.sum("n_f").cast("long").alias("n_t"),
        F.sum("p_f").cast("long").alias("p_t"),
    )
    folds = scored.sparkSession.range(n_folds).select(
        F.col("id").cast("int").alias("fold")
    )
    # dense (fold, score) grid with TRAINING counts by subtraction
    grid = (
        folds.crossJoin(tot)
        .join(g, on=["fold", "score_u"], how="left")
        .select(
            "fold",
            "score_u",
            (F.col("n_t") - F.coalesce("n_f", F.lit(0))).alias("tn"),
            (F.col("p_t") - F.coalesce("p_f", F.lit(0))).alias("tp"),
        )
    )
    w = Window.partitionBy("fold").orderBy("score_u")
    w_all = Window.partitionBy("fold").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = grid.select(
        "fold",
        "score_u",
        F.coalesce(
            F.sum(F.col("tn").cast(big)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast(big),
        ).alias("tl"),
        F.coalesce(
            F.sum(F.col("tp").cast(big)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast(big),
        ).alias("pl"),
        F.sum(F.col("tn").cast(big)).over(w_all).alias("t"),
        F.sum(F.col("tp").cast(big)).over(w_all).alias("p"),
    )
    cand = (
        cum.filter((F.col("tl") > 0) & (F.col("t") - F.col("tl") > 0))
        .withColumn("nl", F.col("tl") - F.col("pl"))
        .withColumn("tr", F.col("t") - F.col("tl"))
        .withColumn("pr", F.col("p") - F.col("pl"))
        .withColumn("nr", F.col("tr") - F.col("pr"))
        .withColumn(
            "child_gini_u",
            F.expr(
                "cast(((tl * tl - pl * pl - nl * nl) * tr"
                " + (tr * tr - pr * pr - nr * nr) * tl) * 1000000"
                " div (tl * tr * t) as bigint)"
            ),
        )
    )
    wr = Window.partitionBy("fold").orderBy(F.asc("child_gini_u"), F.asc("score_u"))
    best = (
        cand.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == 1)
        .select(
            "fold",
            F.col("score_u").alias("threshold_u"),
            # training-majority leaf labels; ties -> negative (0)
            (F.col("pl") * 2 > F.col("tl")).cast("int").alias("left_label"),
            (F.col("pr") * 2 > F.col("tr")).cast("int").alias("right_label"),
        )
    )
    oof = (
        g.join(F.broadcast(best), on="fold")
        .withColumn(
            "_pred",
            F.when(
                F.col("score_u") < F.col("threshold_u"), F.col("left_label")
            ).otherwise(F.col("right_label")),
        )
        .groupBy("fold", "threshold_u", "left_label", "right_label")
        .agg(
            F.sum("n_f").cast("long").alias("oof_n"),
            F.sum(
                F.when(F.col("_pred") == 1, F.col("p_f")).otherwise(
                    F.col("n_f") - F.col("p_f")
                )
            )
            .cast("long")
            .alias("oof_correct"),
        )
    )
    return oof.select(
        "fold",
        "threshold_u",
        "left_label",
        "right_label",
        "oof_n",
        "oof_correct",
        F.expr("cast(oof_correct * 1000000 div oof_n as bigint)").alias(
            "oof_acc_u"
        ),
    )
