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


def _py_shared_spans(docs: dict[int, str], k: int):
    """Brute-force reference model for shared_span_pairs: per pair,
    positions in A whose k-gram occurs anywhere in B; max consecutive
    run + k - 1; docs with < k tokens excluded."""
    grams = {}
    for i, t in docs.items():
        toks = [w for w in t.lower().split() if w]
        if len(toks) < k:
            continue
        grams[i] = [" ".join(toks[p : p + k]) for p in range(len(toks) - k + 1)]
    out = {}
    ids = sorted(grams)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            bset = set(grams[b])
            pos = sorted({p for p, g in enumerate(grams[a]) if g in bset})
            if not pos:
                continue
            best = run = 1
            for x, y in zip(pos, pos[1:]):
                run = run + 1 if y == x + 1 else 1
                best = max(best, run)
            out[(a, b)] = (len(pos), best + k - 1)
    return out


class TestSharedSpanModel:
    @settings(max_examples=12, deadline=None)
    @given(
        texts=st.lists(
            st.lists(st.sampled_from("abcde"), min_size=0, max_size=14).map(" ".join),
            min_size=2,
            max_size=5,
        )
    )
    def test_shared_span_pairs_matches_python_model(self, spark, texts):
        from data_pipeline_childcare_spark.operators.dedup import shared_span_pairs

        docs = dict(enumerate(texts))
        df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): (r["shared_positions"], r["longest_span_tokens"])
            for r in shared_span_pairs(df, k=3, min_span_tokens=3).collect()
        }
        want = _py_shared_spans(docs, k=3)
        assert got == want, (docs, got, want)


def _py_mmr(cand: list[tuple[int, float, list[float]]], k: int, lam: float):
    """Greedy MMR reference model (single query). cand rows:
    (vec_id, rel, vec); returns ordered [vec_id]."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    rel = {i: round(r, 6) for i, r, _ in cand}
    vec = {i: v for i, _, v in cand}
    rest = set(rel)
    sel: list[int] = []
    while rest and len(sel) < k:
        if not sel:
            pick = max(rest, key=lambda i: (rel[i], -i))
        else:
            scored = {
                i: round(
                    lam * rel[i]
                    - (1 - lam) * max(cos(vec[i], vec[s]) for s in sel),
                    6,
                )
                for i in rest
            }
            pick = max(scored, key=lambda i: (scored[i], -i))
        sel.append(pick)
        rest.discard(pick)
    return sel


class TestMmrModel:
    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
                st.tuples(
                    st.floats(min_value=-1, max_value=1, allow_nan=False),
                    st.floats(min_value=-1, max_value=1, allow_nan=False),
                ).filter(lambda v: abs(v[0]) + abs(v[1]) > 1e-3),
            ),
            min_size=1,
            max_size=7,
        )
    )
    def test_mmr_select_matches_python_model(self, spark, rows):
        from data_pipeline_childcare_spark.operators.similarity import mmr_select

        cand = [(i, rel, list(vec)) for i, (rel, vec) in enumerate(rows)]
        df = spark.createDataFrame(
            [(9, i, rel, vec) for i, rel, vec in cand],
            "query_id long, vec_id long, rel_score double, embedding array<double>",
        )
        got = [
            r["vec_id"]
            for r in mmr_select(df, k=3, lam=0.5).orderBy("mmr_rank").collect()
        ]
        assert got == _py_mmr(cand, k=3, lam=0.5), (cand, got)


class TestUrlCanonicalInvariants:
    url_chars = st.text(
        alphabet=st.sampled_from("abAB09./?&=#:_-%~*$"), min_size=0, max_size=40
    )

    @settings(max_examples=40, deadline=None)
    @given(tail=url_chars, scheme=st.sampled_from(["http", "HTTPS", "ftp"]))
    def test_canonical_url_idempotent(self, spark, tail, scheme):
        """Canonicalization is a projection: applying it twice equals
        applying it once, for arbitrary messy URL tails."""
        from data_pipeline_childcare_spark.functions.urls import canonical_url

        url = f"{scheme}://Host.Example.COM:443/{tail}"
        df = spark.createDataFrame([(url,)], "u string")
        once = df.select(canonical_url(F.col("u")).alias("c"))
        twice = once.select(canonical_url(F.col("c")).alias("c"))
        a, b = once.first()["c"], twice.first()["c"]
        assert a == b, (url, a, b)


class TestVp8lRoundtrip:
    @settings(max_examples=12, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=7),
        seed=st.integers(min_value=0, max_value=10_000),
        sub_green=st.booleans(),
        cache=st.sampled_from([0, 3]),
    )
    def test_vp8l_random_images_roundtrip(self, w, h, seed, sub_green, cache):
        """Lossless WebP: ANY image round-trips bit-exactly through
        the independent encoder and the production decoder, across
        dims, transforms, and cache settings."""
        from test_imagecodec import _vp8l_encode

        from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

        rgba = [
            (
                (seed * 7 + i * 13) % 256,
                (seed * 3 + i * 29) % 256,
                (seed + i * 5) % 256,
                (seed * 11 + i * 3) % 256,
            )
            for i in range(w * h)
        ]
        blob = _vp8l_encode(w, h, rgba, subtract_green=sub_green, cache_bits=cache)
        dw, dh, mode, out = decode_webp(blob)
        assert (dw, dh, mode) == (w, h, "RGBA")
        assert out == bytes(v for px in rgba for v in px)


class TestWarcRoundtrip:
    @settings(max_examples=25, deadline=None)
    @given(
        payloads=st.lists(
            st.binary(min_size=0, max_size=60), min_size=1, max_size=5
        ),
        use_gzip=st.booleans(),
    )
    def test_warc_record_roundtrip(self, payloads, use_gzip):
        """Arbitrary binary payloads survive the WARC writer→parser
        round-trip byte-exactly, plain and gzipped."""
        import gzip as _gzip

        from data_pipeline_childcare_spark.sources.warc import parse_warc

        blob = b""
        for i, p in enumerate(payloads):
            blob += (
                f"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:{i}>\r\n"
                f"Content-Length: {len(p)}\r\n\r\n"
            ).encode() + p + b"\r\n\r\n"
        data = _gzip.compress(blob) if use_gzip else blob
        recs = parse_warc(data)
        assert [r["content"] for r in recs] == payloads
        assert [r["headers"]["warc-record-id"] for r in recs] == [
            f"<urn:{i}>" for i in range(len(payloads))
        ]


class TestSpanDedupProperties:
    @given(
        texts=st.lists(
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
                min_size=0,
                max_size=14,
            ).map(" ".join),
            min_size=1,
            max_size=6,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_remove_duplicate_spans_matches_python_model(self, spark, texts):
        """remove_duplicate_spans == a direct python model of
        'first k-window occurrence wins' — on the original corpus AND
        on its own output. NOTE the algorithm is deliberately NOT
        idempotent (Lee et al.'s ExactSubstr is one-pass): cutting a
        later window can make surviving tokens adjacent and form a
        NEW duplicate window (hypothesis found
        'gamma alpha gamma alpha alpha alpha alpha gamma' at k=3), so
        the second-pass invariant is model-equality, not zero
        removals."""
        import hashlib

        from data_pipeline_childcare_spark.operators.dedup import (
            remove_duplicate_spans,
        )

        k = 3
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_duplicate_spans(df, k=k).collect()
        }

        # python model
        toks = {i: t.split() if t else [] for i, t in enumerate(texts)}
        seen: dict[str, tuple[int, int]] = {}
        for i in sorted(toks):
            for p in range(len(toks[i]) - k + 1):
                h = hashlib.md5(" ".join(toks[i][p : p + k]).encode()).hexdigest()
                seen.setdefault(h, (i, p))
        removed: dict[int, set] = {i: set() for i in toks}
        for i in sorted(toks):
            for p in range(len(toks[i]) - k + 1):
                h = hashlib.md5(" ".join(toks[i][p : p + k]).encode()).hexdigest()
                if seen[h] != (i, p):
                    removed[i].update(range(p, p + k))
        for i in toks:
            keep = [t for j, t in enumerate(toks[i]) if j not in removed[i]]
            assert got[i] == (" ".join(keep), len(removed[i])), (i, texts)

        # second pass: still model-exact on the operator's own output
        # (one-pass semantics — removals here are legitimate when the
        # first cut created new adjacencies)
        rebuilt_texts = [got[i][0] for i in sorted(got)]
        rebuilt = spark.createDataFrame(
            list(enumerate(rebuilt_texts)), "doc_id long, text string"
        )
        again = {
            r["doc_id"]: (r["text"], r["n_removed"])
            for r in remove_duplicate_spans(rebuilt, k=k).collect()
        }
        toks2 = {i: t.split() if t else [] for i, t in enumerate(rebuilt_texts)}
        seen2: dict[str, tuple[int, int]] = {}
        for i in sorted(toks2):
            for p in range(len(toks2[i]) - k + 1):
                h = hashlib.md5(" ".join(toks2[i][p : p + k]).encode()).hexdigest()
                seen2.setdefault(h, (i, p))
        for i in sorted(toks2):
            rem: set = set()
            for p in range(len(toks2[i]) - k + 1):
                h = hashlib.md5(" ".join(toks2[i][p : p + k]).encode()).hexdigest()
                if seen2[h] != (i, p):
                    rem.update(range(p, p + k))
            keep = [t for j, t in enumerate(toks2[i]) if j not in rem]
            assert again[i] == (" ".join(keep), len(rem)), (i, texts)

    @given(
        paras=st.lists(
            st.lists(
                st.sampled_from(["shared block", "unique %d" % 7, "tail words", "intro"]),
                min_size=0,
                max_size=4,
            ),
            min_size=1,
            max_size=5,
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_dedup_paragraphs_idempotent(self, spark, paras):
        """A paragraph-deduped corpus re-deduplicates to itself: every
        surviving paragraph is corpus-unique by construction."""
        from data_pipeline_childcare_spark.operators.dedup import dedup_paragraphs

        df = spark.createDataFrame(
            [(i, "\n\n".join(ps)) for i, ps in enumerate(paras)],
            "doc_id long, text string",
        )
        once = dedup_paragraphs(df)
        rows1 = {r["doc_id"]: r for r in once.collect()}
        twice = dedup_paragraphs(
            spark.createDataFrame(
                [(i, rows1[i]["text"]) for i in sorted(rows1)],
                "doc_id long, text string",
            )
        )
        rows2 = {r["doc_id"]: r for r in twice.collect()}
        for i in rows1:
            assert rows2[i]["text"] == rows1[i]["text"]
            assert rows2[i]["n_kept"] == rows2[i]["n_paragraphs"]


class TestRankingEvalInvariants:
    @settings(max_examples=12, deadline=None)
    @given(
        data=st.lists(
            st.tuples(
                st.integers(0, 3),          # query
                st.integers(0, 25),         # item
                st.booleans(),              # in gold?
                st.integers(1, 3),          # gain if gold
            ),
            min_size=1,
            max_size=60,
        ),
        k=st.integers(1, 8),
    )
    def test_ranking_eval_bounds_and_perfect_run(self, spark, data, k):
        """All micro metrics live in [0, 1e6]; a run that ranks the
        gold PERFECTLY (by gain desc) scores nDCG == recall-capped
        ideal == 1e6 when everything fits under k."""
        from pyspark.sql import functions as F

        from data_pipeline_childcare_spark.operators.raneval import ranking_eval

        seen = set()
        run_rows, gold_rows = [], []
        for q, item, in_gold, gain in data:
            if (q, item) in seen:
                continue
            seen.add((q, item))
            if in_gold:
                gold_rows.append((f"q{q}", f"d{item}", gain))
        if not gold_rows:
            gold_rows = [("q0", "d0", 1)]
        # perfect run: per query, gold ranked by (gain desc, item)
        from collections import defaultdict

        by_q = defaultdict(list)
        for q, d, g in gold_rows:
            by_q[q].append((d, g))
        for q, items in by_q.items():
            for rank, (d, _g) in enumerate(
                sorted(items, key=lambda dg: (-dg[1], dg[0])), start=1
            ):
                run_rows.append((q, d, rank))
        run = spark.createDataFrame(run_rows, "query_id string, item_id string, rank int")
        gold = spark.createDataFrame(gold_rows, "query_id string, item_id string, gain int")
        out = ranking_eval(run, gold, k=k).collect()
        assert {r["query_id"] for r in out} == set(by_q)
        for r in out:
            for f in ("recall_micro", "precision_micro", "rr_micro", "ndcg_micro"):
                assert 0 <= r[f] <= 1_000_000, (f, r)
            # perfect ordering: first relevant at rank 1, ideal DCG met
            assert r["rr_micro"] == 1_000_000
            assert r["ndcg_micro"] == 1_000_000
            n_gold = r["n_gold"]
            assert r["hits"] == min(n_gold, k)
            assert r["recall_micro"] == min(n_gold, k) * 1_000_000 // n_gold


class TestDriftInvariants:
    @settings(max_examples=10, deadline=None)
    @given(
        null_every=st.integers(2, 6),
        drop_every=st.integers(2, 6),
        n=st.integers(20, 80),
    )
    def test_drift_null_rates_match_model(self, spark, null_every, drop_every, n):
        from data_pipeline_childcare_spark.operators.drift import snapshot_drift_report

        a_rows = [(i, f"v{i}") for i in range(n)]
        b_rows = [
            (i, None if i % null_every == 0 else f"v{i}")
            for i in range(n)
            if i % drop_every != 0
        ]
        a = spark.createDataFrame(a_rows, "id long, val string")
        b = spark.createDataFrame(b_rows, "id long, val string")
        got = {r["column_name"]: r.asDict() for r in snapshot_drift_report(a, b).collect()}
        nb = len(b_rows)
        nulls_b = sum(1 for _, v in b_rows if v is None)
        assert got["val"]["n_rows_b"] == nb
        assert got["val"]["n_nulls_b"] == nulls_b
        assert got["val"]["null_rate_micro_b"] == (
            nulls_b * 1_000_000 // nb if nb else 0
        )
        expect_status = (
            "drift"
            if nulls_b * 1_000_000 // max(nb, 1) > 10_000
            or abs((nb - nulls_b) - n) * 1_000_000 > 200_000 * n
            else "ok"
        )
        assert got["val"]["status"] == expect_status, got["val"]


class TestClasevalModel:
    @staticmethod
    def _py_eval(rows, thr):
        """Independent integer-micro model of claseval.binary_eval_summary."""
        import math
        from collections import Counter

        MICRO = 1_000_000
        su = [(math.floor(s * MICRO + 0.5), 1 if l else 0) for s, l in rows]
        n = len(su)
        n1 = sum(y for _, y in su)
        n0 = n - n1
        thr_u = round(thr * MICRO)
        tp = sum(1 for u, y in su if u >= thr_u and y)
        fp = sum(1 for u, y in su if u >= thr_u and not y)
        tn = sum(1 for u, y in su if u < thr_u and not y)
        fn = sum(1 for u, y in su if u < thr_u and y)
        cnt = Counter(u for u, _ in su)
        cum, rk = 0, {}
        for u in sorted(cnt):
            rk[u] = 2 * cum + cnt[u] + 1  # min_rank + max_rank
            cum += cnt[u]
        s2 = sum(rk[u] for u, y in su if y)
        auc = (
            (s2 - n1 * (n1 + 1)) * MICRO // (2 * n1 * n0) if n1 and n0 else None
        )
        brier = sum((u - y * MICRO) ** 2 for u, y in su) // (n * MICRO)
        return {
            "n": n, "n_pos": n1, "n_neg": n0,
            "tp": tp, "fp": fp, "tn": tn, "fn": fn,
            "accuracy_u": (tp + tn) * MICRO // n,
            "precision_u": tp * MICRO // (tp + fp) if tp + fp else None,
            "recall_u": tp * MICRO // n1 if n1 else None,
            "f1_u": 2 * tp * MICRO // (2 * tp + fp + fn) if 2 * tp + fp + fn else None,
            "auc_u": auc,
            "brier_u": brier,
        }

    @settings(max_examples=15, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                # a coarse score grid manufactures the tie groups the
                # average-rank AUC path must handle
                st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.5, 0.75, 0.9, 1.0]),
                st.booleans(),
            ),
            min_size=1,
            max_size=40,
        ),
        thr=st.sampled_from([0.25, 0.5, 0.75]),
    )
    def test_binary_eval_matches_python_model(self, spark, rows, thr):
        from data_pipeline_childcare_spark.operators.claseval import (
            binary_eval_summary,
        )

        df = spark.createDataFrame(rows, "score double, label boolean")
        got = binary_eval_summary(df, threshold=thr).collect()[0].asDict()
        want = self._py_eval(rows, thr)
        assert got == want, (got, want)


class TestRound7Invariants:
    @settings(max_examples=15, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                st.booleans(),
            ),
            min_size=2,
            max_size=40,
        )
    )
    def test_gini_stump_gain_nonnegative(self, spark, rows):
        """Splitting can never increase weighted impurity: gain >= 0,
        and child gini is bounded by the parent's."""
        from data_pipeline_childcare_spark.operators.claseval import gini_stump

        df = spark.createDataFrame(
            [(float(s), bool(y)) for s, y in rows], "score double, label boolean"
        )
        r = gini_stump(df).collect()
        if not r:  # all rows share one score -> no non-empty-left split
            return
        row = r[0]
        assert row["gain_u"] >= 0
        assert 0 <= row["child_gini_u"] <= row["parent_gini_u"] <= 500_000

    @settings(max_examples=15, deadline=None)
    @given(
        a=st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False), min_size=1, max_size=30),
        b=st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False), min_size=1, max_size=30),
    )
    def test_ks_bounds_and_identity(self, spark, a, b):
        from data_pipeline_childcare_spark.operators.drift import ks_statistic

        da = spark.createDataFrame([(float(v),) for v in a], "value double")
        db = spark.createDataFrame([(float(v),) for v in b], "value double")
        r = ks_statistic(da, db).collect()[0]
        assert 0 <= r["ks_u"] <= 1_000_000
        same = ks_statistic(da, da).collect()[0]
        assert same["ks_u"] == 0

    @settings(max_examples=10, deadline=None)
    @given(
        vals=st.lists(
            st.floats(min_value=0.01, max_value=100, allow_nan=False),
            min_size=1,
            max_size=50,
        )
    )
    def test_pareto_thresholds_monotone(self, spark, vals):
        from data_pipeline_childcare_spark.operators.skew import (
            pareto_concentration,
        )

        df = spark.createDataFrame(
            [(f"k{i}", float(v)) for i, v in enumerate(vals)],
            "k string, value double",
        )
        r = pareto_concentration(df, ["k"], "value").collect()[0]
        assert 1 <= r["n_for_50"] <= r["n_for_80"] <= r["n_for_90"] <= r["n_keys"]

    @settings(max_examples=15, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=400),
        alpha_u=st.integers(min_value=10_000, max_value=400_000),
    )
    def test_conformal_rank_matches_python_ceiling(self, n, alpha_u):
        """The integer rank n+1-((n+1)·α div 1e6) IS ceil((n+1)(1-α))
        for micro-quantized α — checked against the float ceiling."""
        import math

        rank = n + 1 - ((n + 1) * alpha_u) // 1_000_000
        expected = math.ceil((n + 1) * (1 - alpha_u / 1_000_000))
        # float ceiling can differ by at most the micro quantum; the
        # integer form is the DEFINITION (alpha is exactly alpha_u/1e6)
        exact = math.ceil((n + 1) - ((n + 1) * alpha_u) / 1_000_000)
        assert rank == exact
        assert abs(rank - expected) <= 1


def py_pairwise_metrics(assign: list[tuple]) -> tuple[int, int, int]:
    """Independent brute-force model of er.pairwise_cluster_metrics:
    enumerate every record pair and count pred/true/common."""
    from itertools import combinations

    pred = true = common = 0
    for (p1, t1), (p2, t2) in combinations(assign, 2):
        sp, st_ = p1 == p2, t1 == t2
        pred += sp
        true += st_
        common += sp and st_
    return pred, true, common


class TestClusterMetricsModel:
    @settings(max_examples=20, deadline=None)
    @given(
        labels=st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 3)),
            min_size=1,
            max_size=25,
        )
    )
    def test_pairwise_counts_match_bruteforce(self, spark, labels):
        from data_pipeline_childcare_spark.operators.er import (
            pairwise_cluster_metrics,
        )

        rows = [(i, p, t) for i, (p, t) in enumerate(labels)]
        df = spark.createDataFrame(rows, "id long, p long, t long")
        got = pairwise_cluster_metrics(df, "p", "t").collect()[0]
        pred, true, common = py_pairwise_metrics(labels)
        assert (got.n_pred_pairs, got.n_true_pairs, got.n_common_pairs) == (
            pred, true, common,
        )
        # scores bounded and consistent with counts
        assert 0 <= got.precision_ppm <= 1_000_000
        assert 0 <= got.recall_ppm <= 1_000_000
        if pred:
            assert got.precision_ppm == common * 1_000_000 // pred

    @settings(max_examples=15, deadline=None)
    @given(
        labels=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 2)),
            min_size=1,
            max_size=20,
        )
    )
    def test_bcubed_matches_bruteforce(self, spark, labels):
        from data_pipeline_childcare_spark.operators.er import bcubed_metrics

        rows = [(i, p, t) for i, (p, t) in enumerate(labels)]
        df = spark.createDataFrame(rows, "id long, p long, t long")
        got = bcubed_metrics(df, "p", "t").collect()[0]
        # model with the operator's exact floor discipline: per-cell
        # (n² · 1e6) // n_side, summed, // N
        from collections import Counter

        cells = Counter(labels)
        np_ = Counter(p for p, _ in labels)
        nt = Counter(t for _, t in labels)
        sp = sum(n * n * 1_000_000 // np_[p] for (p, t), n in cells.items())
        sr = sum(n * n * 1_000_000 // nt[t] for (p, t), n in cells.items())
        n = len(labels)
        assert got.bcubed_precision_ppm == sp // n
        assert got.bcubed_recall_ppm == sr // n


class TestBfsModel:
    @settings(max_examples=15, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=25,
        ),
        seeds=st.sets(st.integers(0, 9), min_size=1, max_size=3),
    )
    def test_bfs_matches_python_bfs(self, spark, edges, seeds):
        from collections import deque

        from data_pipeline_childcare_spark.operators.graph import bfs_distances

        edges = [(s, d) for s, d in edges if s != d]
        if not edges:
            return
        adj: dict = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        dist = {s: 0 for s in seeds}
        dq = deque(seeds)
        while dq:
            u = dq.popleft()
            if dist[u] >= 8:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        e = spark.createDataFrame(edges, "src long, dst long")
        sd = spark.createDataFrame([(s,) for s in seeds], "id: long")
        got = {r.id: r.dist for r in bfs_distances(e, sd, max_hops=8).collect()}
        assert got == dist
