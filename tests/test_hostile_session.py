"""The contract surface must hold under a HOSTILE harness session:
non-UTC session timezone, foreign shuffle config, none of the
engine factory's confs. The driver (and any external harness) hands
the engine whatever SparkSession it likes — timestamp arithmetic,
portable hashing, and rounding discipline must not depend on
session.py's defaults.

Representative subset: every value family that COULD go wrong under a
foreign session — timestamp parsing/bucketing (timezone), epoch-week
arithmetic, md5-hash splits/sketches (partitioning), float rounding
(shuffle partition count), and one of each round-4 addition.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from data_pipeline_childcare_spark.io import TESTDATA_TABLES as TABLES

SF = "/root/testdata/sf0.001"

QUERIES = [
    "parse_dates_multi",          # multi-format timestamp parsing
    "events_running_total",       # event-time window ordering
    "hypertable_rollup_events",   # time_bucket origin arithmetic
    "user_retention_cohorts",     # epoch-week floor
    "events_trailing_hour_sum",   # time-RANGE frame
    "doc_train_split",            # md5-threshold split
    "kmv_distinct_users_by_type", # portable hash sketch
    "rrf_suppliers",              # float aggregation + ranking
    "doc_shared_spans",           # round-4: positional shingle index
    "source_mixture_weights",     # round-4: share arithmetic
    "mmr_diverse_topk_embeddings",# round-4: unrolled greedy selection
    "semdedup_embeddings",        # round-5: canonical kmeans + cosine
    "url_canonical_dedup_docs",   # round-5: regex/array normalization
    "robots_filter_docs",         # round-5: longest-match window
    "xpilot_retrieval_reranked_docs",  # round-5: BM25 float discipline
    # round-5 regression: F.lit(datetime) boundaries drifted 8h from
    # try_to_timestamp rows under a non-UTC session (caught by the
    # full --hostile oracle gate; fixed via string-literal boundaries)
    "tuoyu_rule_filter_docs",
    "bpe_learned_merges",       # round-5: binary-collation argmax ties
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def hostile(spark):
    """A sibling session with foreign runtime confs — what an external
    harness that never imported session.py would hand us."""
    s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    s.conf.set("spark.sql.shuffle.partitions", "7")
    yield s


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle_under_hostile_session(hostile, oracle_con, name):
    sdf = entry_mod.queries()[name](hostile, SF).toPandas()
    odf = oracle_con.execute(entry_mod.oracle_sql()[name]).df()
    s, o = _normalize(sdf), _normalize(odf)
    assert list(s.columns) == list(o.columns)
    assert len(s) == len(o), (len(s), len(o))
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, atol=1e-6)
