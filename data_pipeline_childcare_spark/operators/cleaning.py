"""Content-cleaning pipeline as pure column/relational ops.

Re-expresses the reference cleaners (SURVEY.md §2.2 P10-P12, P15):
  - noise-line regex filtering (多数据源获取数据.py:455-490)
  - repeated header/footer removal via line frequency — a
    self-aggregation, not a map (多数据源获取数据.py:507-520)
  - page-number line removal (:468-473)
  - content truncation caps (:476, 614-619)

The repeated-line removal is the interesting one at scale: it is a
groupBy(doc, line) count + window, i.e. one shuffle keyed by document —
embarrassingly parallel across documents and map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Noise patterns distilled from the reference's cleaner; unicode-safe.
NOISE_PATTERNS = [
    r"^第\s*\d+\s*页",  # page numbers "第 N 页"
    r"^Page\s+\d+(\s+of\s+\d+)?$",
    r"^-\s*\d+\s*-$",
    r"分享到",  # share bars
    r"ICP备\d+号",  # ICP license footers
    r"^(上一页|下一页|首页|尾页)",  # pagination links
    r"^Copyright\b|版权所有",
    r"^\s*[|\-+=_*]{3,}\s*$",  # rule lines
]

NOISE_RE = "|".join(f"(?:{p})" for p in NOISE_PATTERNS)


def is_noise_line(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    link_count = F.size(F.split(c, r"https?://")) - 1
    link_dense = (link_count > 2) & (F.length(c) / F.greatest(link_count, F.lit(1)) < 30)
    return c.rlike(NOISE_RE) | link_dense


def explode_lines(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """doc → one row per line with position (reading order preserved)."""
    return docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), r"\n")).alias("line_no", "line")
    )


def remove_noise_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Drop noise lines (P10/P12)."""
    return lines.filter(~is_noise_line(line_col))


def remove_repeated_lines(
    lines: DataFrame,
    id_col: str = "doc_id",
    line_col: str = "line",
    min_count: int = 3,
    max_line_len: int = 100,
    min_doc_lines: int = 20,
) -> DataFrame:
    """Drop short lines occurring ≥ min_count times within a document
    (headers/footers), only for documents with ≥ min_doc_lines lines.

    Reference: 多数据源获取数据.py:507-520. One window pass keyed by
    (doc, line) plus a doc-size window — a single shuffle on doc id.
    """
    w_line = Window.partitionBy(id_col, line_col)
    w_doc = Window.partitionBy(id_col)
    return (
        lines.withColumn("_line_freq", F.count("*").over(w_line))
        .withColumn("_doc_lines", F.count("*").over(w_doc))
        .filter(
            ~(
                (F.col("_doc_lines") >= min_doc_lines)
                & (F.length(F.col(line_col)) < max_line_len)
                & (F.col("_line_freq") >= min_count)
            )
        )
        .drop("_line_freq", "_doc_lines")
    )


def reassemble_lines(
    lines: DataFrame, id_col: str = "doc_id", line_col: str = "line", pos_col: str = "line_no"
) -> DataFrame:
    """lines → doc text again, order restored by position."""
    return lines.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(pos_col), F.col(line_col).alias("l")))),
                lambda s: s["l"],
            ),
        ).alias("text")
    )


def truncate_content(docs: DataFrame, text_col: str = "text", max_chars: int = 80_000) -> DataFrame:
    """Resource-guard cap (reference: 80k chars/doc)."""
    return docs.withColumn(text_col, F.substring(F.col(text_col), 1, max_chars))


def clean_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_chars: int = 80_000
) -> DataFrame:
    """Full cleaning pipeline: explode → noise filter → repeated-line
    removal → reassemble → truncate (reference pipeline order)."""
    lines = explode_lines(docs, id_col, text_col)
    lines = remove_noise_lines(lines)
    lines = remove_repeated_lines(lines, id_col=id_col)
    out = reassemble_lines(lines, id_col=id_col)
    return truncate_content(out.withColumnRenamed("text", text_col), text_col, max_chars)


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition metrics in the Gopher/RefinedWeb family
    of training-data quality filters:

    - ``n_lines``: non-empty (trimmed) line instances
    - ``dup_line_frac``: fraction of line instances that are repeats
      of an earlier identical line (1 - distinct/total)
    - ``dup_line_char_frac``: fraction of line characters living in
      lines that occur more than once
    - ``top_bigram_frac``: occurrence share of the most common word
      bigram

    All four are two hash-aggregates keyed by (doc, line|bigram) then
    (doc) — map-side combinable, uniform keys, no windows. Thresholds
    are policy, so this returns the raw metrics; filter downstream
    (e.g. drop docs with dup_line_char_frac > 0.2).
    """
    from data_pipeline_childcare_spark.functions.text import word_ngrams
    from data_pipeline_childcare_spark.io import spread_partitions

    spread = spread_partitions(docs, id_col)
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    per_line = (
        spread.select(F.col(id_col), F.explode(lines_arr).alias("_line"))
        .groupBy(id_col, "_line")
        .count()
        .withColumn("_len", F.length("_line"))
    )
    line_stats = per_line.groupBy(id_col).agg(
        F.sum("count").alias("n_lines"),
        F.count("*").alias("_distinct"),
        F.sum(F.col("count") * F.col("_len")).alias("_chars"),
        F.sum(
            F.when(F.col("count") > 1, F.col("count") * F.col("_len")).otherwise(0)
        ).alias("_dup_chars"),
    )
    bigram_stats = (
        spread.select(F.col(id_col), F.explode(word_ngrams(F.col(text_col), 2)).alias("_bg"))
        .groupBy(id_col, "_bg")
        .count()
        .groupBy(id_col)
        .agg(F.max("count").alias("_top_bg"), F.sum("count").alias("_total_bg"))
    )
    return (
        docs.select(id_col)
        .join(line_stats, id_col, "left")
        .join(bigram_stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.round(
                F.when(
                    F.col("n_lines") > 0,
                    1 - F.col("_distinct") / F.col("n_lines"),
                ).otherwise(0.0),
                4,
            ).alias("dup_line_frac"),
            F.round(
                F.when(
                    F.col("_chars") > 0, F.col("_dup_chars") / F.col("_chars")
                ).otherwise(0.0),
                4,
            ).alias("dup_line_char_frac"),
            F.round(
                F.when(
                    F.col("_total_bg") > 0, F.col("_top_bg") / F.col("_total_bg")
                ).otherwise(0.0),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def corpus_line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 5,
) -> DataFrame:
    """Corpus-WIDE boilerplate removal (CCNet-style): drop lines whose
    normalized form appears in more than ``max_df`` distinct documents
    (nav menus, cookie banners, footers), then reassemble each
    document in original line order → (id, clean_text, n_lines_kept).

    Complements :func:`remove_repeated_lines`, which is per-document.
    Shapes: one explode + a (key → distinct-doc count) aggregate — the
    hot-line table is tiny by construction (only lines crossing the
    df threshold) — then an anti join and one per-doc rebuild
    aggregate. Empty lines are structural and never counted. At
    100 TB CCNet shards this by line-hash range; the same three
    aggregates apply per shard.
    """
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_line"),
    ).withColumn("_key", F.lower(F.trim(F.col("_line"))))
    hot = (
        lines.filter(F.col("_key") != "")
        .groupBy("_key")
        .agg(F.count_distinct(id_col).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("_key")
    )
    kept = lines.join(hot, "_key", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_ln", "_line"))),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count("*").alias("n_lines_kept"),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        )
    )


def gopher_repetition_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    top_thresholds_u: dict[int, int] | None = None,
    dup_thresholds_u: dict[int, int] | None = None,
    flag_min_tokens: int = 0,
) -> DataFrame:
    """The n-gram half of the Gopher repetition filter (Rae et al.
    2021 Table A1; :func:`repetition_stats` covers the line half):

    - ``top{n}_char_frac_u`` (n = 2, 3, 4): fraction of characters
      inside occurrences of the doc's MOST FREQUENT word n-gram —
      ``count · chars(ngram) / total_token_chars``, the boilerplate
      detector ("click here to click here to ...").
    - ``dup{n}_char_frac_u`` (n = 5, 10): fraction of characters
      inside n-grams that occur MORE THAN ONCE — the occurrence-mass
      convention (each occurrence's characters count; overlapping
      spans are not unioned), the standard reimplementation
      (datatrove/NeMo-Curator) of the paper's span metric.

    Char base is total token characters (separators excluded), so
    the metrics are whitespace-normalization-invariant. Metrics are
    NULL when the doc has fewer than n tokens (the paper only
    applies each filter above a minimum length — a 3-token doc is
    its own top-4-gram and would always flag). ``gopher_flagged``
    ORs the strict-> threshold tests over non-null metrics
    (defaults: top 0.20/0.18/0.16, dup 0.15/0.10 — Table A1).

    All fractions are integer micros with DECIMAL(38,0) products —
    exact, engine-portable. Scale shape (round-7 single-pass form):
    ONE corpus scan projects every n's gram array n-TAGGED into one
    flattened explode (tokenize is evaluated once per row — the
    shifted-slice arrays all reference it at top level, where codegen
    CSE collapses them), ONE (doc, n, gram) hash aggregate, one
    (doc, n)-keyed window + one doc-keyed conditional-aggregation
    pivot. The previous per-n form ran 5 separate scan→explode→agg
    chains and measured 3.14× at 10×; this is the same math in one
    pass."""
    from data_pipeline_childcare_spark.functions.text import tokenize, word_ngrams
    from data_pipeline_childcare_spark.io import spread_partitions

    top_thr = top_thresholds_u or {2: 200_000, 3: 180_000, 4: 160_000}
    dup_thr = dup_thresholds_u or {5: 150_000, 10: 100_000}
    all_ns = sorted(set(top_ns) | set(dup_ns))
    spread = spread_partitions(docs, id_col)
    toks = tokenize(F.col(text_col))
    base = spread.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(F.concat_ws("", toks)).cast("long").alias("total_chars"),
    )

    def _tagged(n: int):
        return F.transform(
            word_ngrams(F.col(text_col), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    allgrams = spread.select(
        F.col(id_col),
        F.explode(F.flatten(F.array(*[_tagged(n) for n in all_ns]))).alias("_x"),
    ).select(id_col, F.col("_x.n").alias("_n"), F.col("_x.g").alias("_g"))
    per = allgrams.groupBy(id_col, "_n", "_g").agg(
        F.count(F.lit(1)).cast("long").alias("_c"),
        (F.length(F.first("_g")) - (F.col("_n") - 1)).cast("long").alias("_chars"),
    )
    w = Window.partitionBy(id_col, "_n").orderBy(
        F.desc("_c"), F.desc("_chars"), F.asc("_g")
    )
    mass = F.col("_c").cast("decimal(38,0)") * F.col("_chars").cast("decimal(38,0)")
    stats = (
        per.withColumn("_rn", F.row_number().over(w))
        .groupBy(id_col, "_n")
        .agg(
            F.max(F.when(F.col("_rn") == 1, mass)).alias("_top_mass"),
            F.sum(
                F.when(F.col("_c") > 1, mass).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ).alias("_dup_mass"),
        )
    )
    pivoted = stats.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("_n") == n, F.col("_top_mass"))).alias(f"_tm{n}")
            for n in top_ns
        ],
        *[
            F.max(F.when(F.col("_n") == n, F.col("_dup_mass"))).alias(f"_dm{n}")
            for n in dup_ns
        ],
    )
    out = base.join(pivoted, on=id_col, how="left")
    for n in top_ns:
        out = out.withColumn(
            f"top{n}_char_frac_u",
            F.expr(
                f"CASE WHEN n_tokens >= {n} AND total_chars > 0 "
                f"THEN cast(_tm{n} * 1000000 div cast(total_chars as decimal(38,0)) as bigint) END"
            ),
        ).drop(f"_tm{n}")
    for n in dup_ns:
        out = out.withColumn(
            f"dup{n}_char_frac_u",
            F.expr(
                f"CASE WHEN n_tokens >= {n} AND total_chars > 0 "
                f"THEN cast(_dm{n} * 1000000 div cast(total_chars as decimal(38,0)) as bigint) END"
            ),
        ).drop(f"_dm{n}")
    flag = F.lit(False)
    for n in top_ns:
        flag = flag | (F.col(f"top{n}_char_frac_u") > top_thr[n])
    for n in dup_ns:
        flag = flag | (F.col(f"dup{n}_char_frac_u") > dup_thr[n])
    # Gopher applies the repetition tests only above a minimum doc
    # length — on a 6-token doc a UNIQUE top bigram is already ~40%
    # of the characters, so unguarded thresholds flag every short doc
    flag = F.coalesce(flag, F.lit(False)) & (
        F.col("n_tokens") >= F.lit(flag_min_tokens)
    )
    return out.withColumn("gopher_flagged", flag)


def gopher_repetition_sql(
    tokens_sql: str,
    table: str = "documents",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 10),
    top_thresholds_u: dict[int, int] | None = None,
    dup_thresholds_u: dict[int, int] | None = None,
    flag_min_tokens: int = 0,
) -> str:
    """DuckDB twin of :func:`gopher_repetition_signals`, generated by
    the same parameterization: per-n n-gram CTEs (the inclusive-slice
    spelling), HUGEINT masses, identical null guards and tie-breaks."""
    top_thr = top_thresholds_u or {2: 200_000, 3: 180_000, 4: 160_000}
    dup_thr = dup_thresholds_u or {5: 150_000, 10: 100_000}
    ctes = [
        f"toks AS (SELECT doc_id, {tokens_sql} AS t FROM {table})",
        """base AS (
            SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(length(array_to_string(t, '')) AS BIGINT) AS total_chars
            FROM toks
        )""",
    ]
    sel, joins = [], []
    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(
            f"""g{n} AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(t) - {n - 1}, 1)),
                       i -> array_to_string(t[i:i+{n - 1}], ' '))) AS g
            FROM toks
        )"""
        )
        ctes.append(
            f"""p{n} AS (
            SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c,
                   CAST(length(g) - {n - 1} AS BIGINT) AS ch
            FROM g{n} GROUP BY doc_id, g
        )"""
        )
    for n in top_ns:
        ctes.append(
            f"""t{n} AS (
            SELECT doc_id, CAST(c AS HUGEINT) * ch AS mass FROM (
                SELECT doc_id, c, ch, g,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY c DESC, ch DESC, g ASC) AS rn
                FROM p{n}
            ) WHERE rn = 1
        )"""
        )
        joins.append(f"LEFT JOIN t{n} ON b.doc_id = t{n}.doc_id")
        sel.append(
            f"""CASE WHEN b.n_tokens >= {n} AND b.total_chars > 0
                THEN CAST(t{n}.mass * 1000000 // b.total_chars AS BIGINT)
                END AS top{n}_char_frac_u"""
        )
    for n in dup_ns:
        ctes.append(
            f"""d{n} AS (
            SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN CAST(c AS HUGEINT) * ch
                       ELSE CAST(0 AS HUGEINT) END) AS dmass
            FROM p{n} GROUP BY doc_id
        )"""
        )
        joins.append(f"LEFT JOIN d{n} ON b.doc_id = d{n}.doc_id")
        sel.append(
            f"""CASE WHEN b.n_tokens >= {n} AND b.total_chars > 0
                THEN CAST(d{n}.dmass * 1000000 // b.total_chars AS BIGINT)
                END AS dup{n}_char_frac_u"""
        )
    flags = [
        f"top{n}_char_frac_u > {top_thr[n]}" for n in top_ns
    ] + [f"dup{n}_char_frac_u > {dup_thr[n]}" for n in dup_ns]
    inner = (
        "SELECT b.doc_id, b.n_tokens, b.total_chars,\n"
        + ",\n".join(sel)
        + "\nFROM base b "
        + " ".join(joins)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f", res AS ({inner})\n"
        + "SELECT *, (coalesce("
        + " OR ".join(flags)
        + f", FALSE) AND n_tokens >= {flag_min_tokens}) AS gopher_flagged FROM res"
    )
