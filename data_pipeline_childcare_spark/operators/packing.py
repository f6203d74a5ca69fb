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
