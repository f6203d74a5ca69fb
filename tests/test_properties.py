"""Property-based tests (hypothesis) — invariants the oracle harness
can't express, checked against an independent pure-Python model."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.udfs import extract_json
from data_pipeline_childcare_spark.operators.skew import df_capped_index, salted_sum

WORDS = ["spark", "query", "table", "join", "agg", "scan", "的", "数据"]
texts = st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join)


def py_word_ngrams(text: str, n: int = 3) -> list[str]:
    """Independent model of functions.text.word_ngrams."""
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    if not toks:
        return [""]
    if len(toks) <= n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


class TestNgramModel:
    @settings(max_examples=20, deadline=None)
    @given(texts=st.lists(texts, min_size=1, max_size=5))
    def test_word_ngrams_matches_python_model(self, spark, texts):
        from data_pipeline_childcare_spark.functions.text import word_ngrams

        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
        got = {r["i"]: r["g"] for r in df.select("i", word_ngrams(F.col("t"), 3).alias("g")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == py_word_ngrams(t, 3), repr(t)


class TestChunkInvariants:
    @settings(max_examples=15, deadline=None)
    @given(
        text=st.text(
            alphabet=st.sampled_from("ab 的.\n"), min_size=0, max_size=400
        ),
        parent_max=st.sampled_from([16, 64, 1024]),
    )
    def test_chunk_caps_and_coverage(self, spark, text, parent_max):
        from data_pipeline_childcare_spark.operators.chunking import parent_child_chunk

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = parent_child_chunk(df, parent_max=parent_max, child_max=8).collect()
        # caps always hold
        assert all(len(r["parent_text"]) <= parent_max for r in rows)
        assert all(len(r["child_text"]) <= 8 for r in rows)
        # no chunk is empty
        assert all(r["child_text"] for r in rows)


class TestJsonRepair:
    @settings(max_examples=30, deadline=None)
    @given(
        obj=st.recursive(
            st.one_of(st.integers(-10, 10), st.booleans(), st.text(max_size=5)),
            lambda c: st.dictionaries(st.text(min_size=1, max_size=4), c, max_size=3),
            max_leaves=6,
        )
    )
    def test_roundtrip_valid_json(self, obj):
        import json

        if not isinstance(obj, dict):
            return
        assert extract_json(json.dumps(obj, ensure_ascii=False)) == obj

    @settings(max_examples=30, deadline=None)
    @given(noise=st.text(max_size=30))
    def test_never_raises_on_garbage(self, noise):
        extract_json(noise)  # must not throw


def test_salted_sum_equivalence(spark):
    df = spark.createDataFrame(
        [(k, float(v)) for k in ("a", "b") for v in range(50)], "k string, v double"
    )
    plain = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r["k"]: r["total"] for r in salted_sum(df, ["k"], "v", n_salts=4).collect()}
    assert salted == plain


def test_df_capped_index_drops_hot_keys(spark):
    idx = spark.createDataFrame(
        [(d, "hot") for d in range(10)] + [(1, "cold"), (2, "cold")],
        "doc_id long, shingle string",
    )
    kept = df_capped_index(idx, "shingle", max_df=5)
    got = {r["shingle"] for r in kept.collect()}
    assert got == {"cold"}


class TestGifLzwProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        data=st.binary(min_size=1, max_size=400),
        mcs=st.integers(min_value=2, max_value=7),
    )
    def test_lzw_roundtrip_random_indices(self, data, mcs):
        """Any index stream (values < 2^mcs) survives the in-test
        encoder → production decoder round trip — exercising variable
        code widths, dictionary growth, and the KwKwK case at random."""
        from data_pipeline_childcare_spark.sources.imagecodec import (
            _gif_lzw_decode,
        )
        from tests.test_imagecodec import _lzw_encode

        idx = bytes(b % (1 << mcs) for b in data)
        encoded = _lzw_encode(mcs, idx)
        assert bytes(_gif_lzw_decode(mcs, encoded, len(idx))) == idx


class TestHistogramQuantileProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_estimate_within_half_bin(self, spark, vals):
        import math

        from data_pipeline_childcare_spark.operators.sketches import (
            histogram_quantiles,
        )

        df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
        got = {
            r["q"]: r["est_value"]
            for r in histogram_quantiles(df, ("g",), "v", bins=64).collect()
        }
        s = sorted(vals)
        n = len(s)
        width = (s[-1] - s[0]) / 64
        for q in (0.5, 0.9, 0.99):
            exact = s[math.ceil(q * n) - 1]
            assert abs(got[q] - exact) <= width / 2 + 1e-6 + abs(exact) * 1e-12


class TestBloomProperty:
    @settings(max_examples=10, deadline=None)
    @given(
        build=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
        probe=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40),
    )
    def test_prefilter_superset_of_matches(self, spark, build, probe):
        from data_pipeline_childcare_spark.operators.bloom import (
            bloom_build,
            bloom_prefilter,
        )

        bdf = spark.createDataFrame([(int(v),) for v in build], "k long")
        pdf = spark.createDataFrame([(int(v),) for v in probe], "k long")
        bitmap = bloom_build(bdf, "k", m=512, k=3)
        kept = {r["k"] for r in bloom_prefilter(pdf, "k", bitmap, m=512, k=3).collect()}
        assert (set(build) & set(probe)) <= kept
