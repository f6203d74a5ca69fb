"""SQ8 scalar quantization: code-range invariants, hand-computed
buckets, degenerate dimensions, and recall vs brute-force cosine."""

from data_pipeline_childcare_spark.operators.similarity import (
    cosine_topk_bruteforce,
    sq8_encode,
    sq8_stats,
    sq8_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_stats_and_hand_buckets(spark):
    df = _corpus(
        spark,
        [(1, [0.0, 10.0]), (2, [1.0, 10.0]), (3, [0.5, 10.0])],
    )
    st = {r["pos"]: (r["lo"], r["hi"]) for r in sq8_stats(df).collect()}
    assert st == {1: (0.0, 1.0), 2: (10.0, 10.0)}
    codes = {
        r["vec_id"]: r["codes"] for r in sq8_encode(df, sq8_stats(df)).collect()
    }
    # dim 1: affine map onto 0..255, round-half-up; dim 2 degenerate -> 0
    assert codes[1] == [0, 0]
    assert codes[2] == [255, 0]
    assert codes[3] == [128, 0]  # floor(0.5*255 + 0.5) = floor(128.0)


def test_codes_in_range_and_integer(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) as embedding"
    )
    rows = sq8_encode(emb, sq8_stats(emb)).collect()
    for r in rows[:50]:
        assert all(isinstance(c, int) and 0 <= c <= 255 for c in r["codes"])


def test_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) as embedding"
    )
    q = emb.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    approx = sq8_topk(emb, q, k=5, rerank_shortlist=50)
    exact = cosine_topk_bruteforce(emb, q, k=5)
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    # 50-deep shortlist + exact re-rank: expect high top-5 recall
    assert len(a & e) >= int(0.8 * len(e))
    assert len(a) == len(e) == 15


def test_no_rerank_scores_monotone(spark):
    df = _corpus(
        spark,
        [(i, [float(i % 7), float((3 * i) % 11), float(i % 5)]) for i in range(1, 30)],
    )
    q = df.filter("vec_id = 1").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    out = sq8_topk(df, q, k=3)
    assert [f.name for f in out.schema.fields] == [
        "query_id",
        "vec_id",
        "sq_score",
        "rank",
    ]
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert len(rows) == 3
    assert rows[0]["sq_score"] >= rows[-1]["sq_score"]
