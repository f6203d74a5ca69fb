"""Sequence packing for LLM pre-training (beyond-reference).

Training dataloaders consume fixed-length token windows; the packing
step assigns each document a (bin, offset) inside a stream of
``seq_len``-token bins. The deterministic contract here:

- documents are ordered by an engine-portable md5 shuffle key (the
  same "deterministic shuffle" used by ``operators/split.py``) inside
  a shard;
- the exclusive running token total gives each doc its stream
  position: ``bin_id = cum_excl // seq_len``,
  ``bin_offset = cum_excl % seq_len`` (a doc whose tokens straddle a
  boundary starts in ``bin_id`` and the loader wraps — the standard
  packed-stream layout);
- sharding (first hex digit of the md5 key mod ``n_shards``) bounds
  every window to one shard, so the running sum parallelizes: at
  100 TB you raise ``n_shards`` to executor scale and each shard's
  window is an independent, sorted, single-pass stream. A global
  (unsharded) pack would serialize on one partition — that is the
  scale trap this shape avoids.

Everything is integer column arithmetic over a portable hash —
bit-identical in any engine, so the packing layout itself is
SQL-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    n_shards: int = 4,
) -> DataFrame:
    """(id, shard, n_tokens, bin_id, bin_offset): deterministic packed
    layout of the corpus into ``seq_len``-token bins per shard."""
    key = F.md5(F.col(id_col).cast("string"))
    shard = F.expr(f"cast(conv(substring(md5(cast({id_col} as string)), 1, 1), 16, 10) as bigint) % {n_shards}")
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        key.alias("_k"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        (cum_excl / seq_len).cast("long").alias("bin_id"),
        (cum_excl % seq_len).alias("bin_offset"),
    )


def pack_sql(
    table: str,
    tokens_len_expr: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    n_shards: int = 4,
) -> str:
    """DuckDB oracle twin of :func:`pack_sequences`.
    ``tokens_len_expr`` is the SQL expression for the token count (the
    shared tokenizer fragment's length)."""
    return f"""
        WITH base AS (
            SELECT {id_col},
                   CAST(CONCAT('0x', substring(md5(CAST({id_col} AS VARCHAR)), 1, 1)) AS BIGINT) % {n_shards} AS shard,
                   md5(CAST({id_col} AS VARCHAR)) AS k,
                   CAST({tokens_len_expr} AS BIGINT) AS n_tokens
            FROM {table}
        ), pos AS (
            SELECT {id_col}, shard, n_tokens,
                   COALESCE(CAST(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY k
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS BIGINT), 0) AS cum_excl
            FROM base
        )
        SELECT {id_col}, shard, n_tokens,
               cum_excl // {seq_len} AS bin_id,
               cum_excl % {seq_len} AS bin_offset
        FROM pos
    """


PPM = 10**6


def pack_audit(
    packed: DataFrame,
    seq_len: int = 2048,
) -> DataFrame:
    """Per-shard audit of a packed-stream layout (the governance row a
    dataloader team reads before a training run): one row per shard
    with

    - ``n_docs`` / ``total_tokens`` — volume,
    - ``n_bins`` — occupied ``seq_len`` windows, derived from the
      LAYOUT itself (max over docs of the last bin each doc's tokens
      touch, ``bin_id + (bin_offset + n_tokens − 1) div seq_len``,
      plus one) — not recomputed as ceil(total/seq_len) from the
      token sum, so a corrupted/gappy layout shows up as
      ``tail_waste``/``fill_ppm`` drifting from the ceil-consistent
      values the pinned test asserts (zero-token docs are excluded
      from the max: they occupy no window),
    - ``tail_waste`` — padding in the final partial bin (the ONLY
      waste a straddling stream layout has, by construction),
    - ``n_straddling`` — docs whose tokens cross a bin boundary (the
      loader wraps these; attention-mask policy cares about the count),
    - ``fill_ppm`` — total_tokens / (n_bins·seq_len) in integer ppm.

    One shard-keyed aggregate over the packed frame — no window, no
    join; shard imbalance falls out of comparing the rows. Composes
    with :func:`pack_sequences`; the SQL twin nests :func:`pack_sql`.
    """
    straddle = (F.col("bin_offset") + F.col("n_tokens")) > F.lit(seq_len)
    # last seq_len-window this doc's tokens touch (NULL for empty docs
    # so a trailing zero-token doc parked exactly on a bin boundary
    # can't inflate the count)
    last_bin = F.expr(
        f"if(n_tokens > 0,"
        f" bin_id + (bin_offset + n_tokens - 1) div {seq_len}, null)"
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(straddle.cast("long")).alias("n_straddling"),
            (F.coalesce(F.max(last_bin), F.lit(-1).cast("long")) + 1)
            .cast("long")
            .alias("n_bins"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "n_bins",
            F.expr(f"n_bins * {seq_len} - total_tokens").alias("tail_waste"),
            "n_straddling",
            F.expr(
                f"if(n_bins = 0, 0L,"
                f" (total_tokens * cast({PPM} as bigint))"
                f" div (n_bins * {seq_len}))"
            ).alias("fill_ppm"),
        )
    )
