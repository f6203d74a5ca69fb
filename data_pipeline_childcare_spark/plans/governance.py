"""Deletion propagation (right-to-be-forgotten) across a table
graph — the governance pass a 100 TB corpus warehouse runs on every
erasure batch: given subject keys, semi-join out every row belonging
to a subject, FOLLOW the foreign-key chain (orders → their line
items) so no orphaned derivative survives, and emit a per-table
audit the compliance log keeps.

Scale shape: the subject set is erasure-batch-sized → every
membership test is a BROADCAST semi/anti join against the fact scan
(no shuffle of the big side); the one derived frontier (purged order
keys) is itself output-sized and broadcasts into the lineitem pass.
Keep-side frames are returned lazily so the caller writes them as
the next table version (copy-on-write erasure — the Delta/Iceberg
DELETE pattern); nothing here mutates inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purge_customers(
    customers: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    subjects: DataFrame,
) -> dict[str, DataFrame]:
    """Propagate erasure of ``subjects`` (a one-column c_custkey
    frame) through customer → orders → lineitem and customer →
    events (user_id shares the customer key domain).

    Returns ``{"audit": ..., "kept_customers": ..., "kept_orders":
    ..., "kept_lineitem": ..., "kept_events": ...}``; ``audit`` has
    one row per table: (table, n_purged, n_kept).
    """
    subj = F.broadcast(subjects.select(F.col(subjects.columns[0]).alias("_k")).distinct())

    def _split(df: DataFrame, key: str) -> tuple[DataFrame, DataFrame]:
        purged = df.join(subj, df[key] == subj._k, "left_semi")
        kept = df.join(subj, df[key] == subj._k, "left_anti")
        return purged, kept

    p_cust, k_cust = _split(customers, "c_custkey")
    p_ord, k_ord = _split(orders, "o_custkey")
    # the derived frontier: line items of purged orders (their own
    # custkey is not on the row — the FK chain is the only path)
    okeys = F.broadcast(p_ord.select(F.col("o_orderkey").alias("_ok")).distinct())
    p_li = lineitem.join(okeys, lineitem.l_orderkey == okeys._ok, "left_semi")
    k_li = lineitem.join(okeys, lineitem.l_orderkey == okeys._ok, "left_anti")
    p_ev, k_ev = _split(events, "user_id")

    def _row(name: str, purged: DataFrame, kept: DataFrame) -> DataFrame:
        return purged.agg(F.count(F.lit(1)).alias("n_purged")).crossJoin(
            kept.agg(F.count(F.lit(1)).alias("n_kept"))
        ).select(F.lit(name).alias("table"), "n_purged", "n_kept")

    audit = (
        _row("customer", p_cust, k_cust)
        .unionByName(_row("orders", p_ord, k_ord))
        .unionByName(_row("lineitem", p_li, k_li))
        .unionByName(_row("events", p_ev, k_ev))
    )
    return {
        "audit": audit,
        "kept_customers": k_cust,
        "kept_orders": k_ord,
        "kept_lineitem": k_li,
        "kept_events": k_ev,
    }
