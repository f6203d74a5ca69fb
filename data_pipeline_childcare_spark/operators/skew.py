"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the remaining cases a 100 TB pipeline hits:

- salted two-phase aggregation: a hot groupBy key (one user with 10^8
  events, one shingle in every document) overloads a single reducer.
  Salting spreads phase 1 over ``n_salts`` partial keys; phase 2
  combines the partials — both phases map-side combinable.
- frequency-capped inverted index: drop join keys whose document
  frequency exceeds a cap BEFORE the pair-generating self-join (the
  standard df-cut for shingle indexes; a shingle in half the corpus
  generates |corpus|²/4 pairs and carries no similarity signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
    out_col: str = "total",
) -> DataFrame:
    """Two-phase salted sum: groupBy(key, salt) → groupBy(key).

    Equivalent to ``groupBy(key).sum(value)`` for any data; worth the
    second (tiny) shuffle only when a key is hot enough to overwhelm
    one reducer. The salt is a uniform hash of a random-ish row
    attribute, so phase-1 partials are balanced.
    """
    salt = (F.abs(F.xxhash64(F.col(value_col), F.monotonically_increasing_id())) % n_salts).alias(
        "_salt"
    )
    phase1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(out_col))


def broadcast_salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Hot-key equi-join: replicate the SMALL side n_salts× and salt
    the big side, so one hot key spreads over n_salts reducers.

    Only needed when the small side is too big to broadcast outright
    but the join key is skewed; with a broadcastable small side,
    ``big.join(broadcast(small), on)`` already avoids the skew.
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "_salt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("int")
    )
    return big_salted.join(small_rep, [on, "_salt"]).drop("_salt")


def df_capped_index(
    index: DataFrame,
    key_col: str,
    max_df: int,
) -> DataFrame:
    """Drop inverted-index keys with document frequency > max_df before
    a pair-generating self-join (hot-shingle cut)."""
    freq = index.groupBy(key_col).agg(F.count("*").alias("_df"))
    keep = freq.filter(F.col("_df") <= max_df).select(key_col)
    return index.join(keep, key_col, "left_semi")
