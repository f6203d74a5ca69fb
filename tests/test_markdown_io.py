"""Markdown image handling (S15/J6), chunk-metadata enrichment (J1),
and bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.markdown import (
    drop_image_refs,
    extract_image_refs,
    rewrite_image_refs,
)
from data_pipeline_childcare_spark.io import write_bucketed
from data_pipeline_childcare_spark.plans.retrieval import enrich_chunks_with_doc_meta

MD = "intro ![alt](images/Fig1.PNG) mid ![x](http://a/b/chart.png extra) end ![y](data:image/png;base64,AAA)"


def test_extract_image_refs(spark):
    df = spark.createDataFrame([(MD,)], "text string")
    refs = df.select(extract_image_refs("text").alias("r")).first()["r"]
    assert refs == ["images/Fig1.PNG", "http://a/b/chart.png", "data:image/png;base64,AAA"]


def test_rewrite_image_refs_case_insensitive_j6(spark):
    docs = spark.createDataFrame([(1, "see ![f](local/FIG1.png) and ![g](other.jpg)")], "doc_id long, text string")
    uploads = spark.createDataFrame(
        [("fig1.jpeg", "https://cdn/x/fig1"),], "filename string, served_url string"
    )
    out = rewrite_image_refs(docs, uploads).first()["text"]
    # FIG1.png matched fig1.jpeg on the extension-less lowercase key
    assert "https://cdn/x/fig1" in out
    assert "other.jpg" in out  # unmatched ref left alone


def test_rewrite_no_refs_doc_survives(spark):
    docs = spark.createDataFrame([(1, "no images here")], "doc_id long, text string")
    uploads = spark.createDataFrame([("a.png", "u")], "filename string, served_url string")
    assert rewrite_image_refs(docs, uploads).first()["text"] == "no images here"


def test_drop_image_refs(spark):
    df = spark.createDataFrame([(MD,)], "text string")
    out = df.select(drop_image_refs("text").alias("t")).first()["t"]
    assert "![" not in out and out.startswith("intro") and "end" in out


def test_enrich_chunks_left_outer_j1(spark):
    chunks = spark.createDataFrame(
        [("db1", "d1", "c1"), ("db1", "d2", "c2")],
        "database_id string, document_id string, chunk_id string",
    )
    meta = spark.createDataFrame(
        [("db1", "d1", "报告")], "database_id string, document_id string, doc_name string"
    )
    rows = {r["chunk_id"]: r["doc_name"] for r in enrich_chunks_with_doc_meta(chunks, meta).collect()}
    assert rows == {"c1": "报告", "c2": None}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    # (gitignored) and are dropped below
    left = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "t_left", ["k"], n_buckets=8)
    write_bucketed(right, "t_right", ["k"], n_buckets=8)
    j = spark.table("t_left").join(spark.table("t_right"), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:500]
    assert j.count() == 1000
    spark.sql("DROP TABLE t_left")
    spark.sql("DROP TABLE t_right")


def test_format_roundtrip_orc_json_csv(spark, tmp_path):
    """write_table/read_table_format preserve values across every
    supported format; json/csv round-trip exactly when the reader is
    given the writer's schema (no inference drift)."""
    from data_pipeline_childcare_spark.io import (
        load_table,
        read_table_format,
        write_table,
    )

    li = load_table(spark, "lineitem", "/root/testdata/sf0.001").limit(200)
    expected = sorted(map(tuple, li.collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"rt_{fmt}")
        write_table(li, path, fmt=fmt)
        back = read_table_format(spark, path, fmt=fmt, schema=li.schema)
        assert sorted(map(tuple, back.collect())) == expected, fmt


def test_csv_roundtrip_newlines_empties_nulls(spark, tmp_path):
    from data_pipeline_childcare_spark.io import read_table_format, write_table

    df = spark.createDataFrame(
        [(1, "line one\nline two"), (2, ""), (3, None), (4, "plain")],
        "id long, text string",
    )
    path = str(tmp_path / "csv_hard")
    write_table(df, path, fmt="csv")
    back = read_table_format(spark, path, fmt="csv", schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_upload_images_then_rewrite_closes_s15(spark):
    """The full S15 closure: extract refs → upload (injected
    deterministic transport, one failing batch) → rewrite. Failed
    uploads leave their refs untouched; successes rewrite to the
    served URL."""
    from pyspark.sql import functions as F

    from data_pipeline_childcare_spark.functions.markdown import (
        rewrite_image_refs,
    )
    from data_pipeline_childcare_spark.sources.uploads import upload_images

    def make_transport():
        # defined inside the test body: cloudpickle ships it by value
        import hashlib

        def tp(endpoint, batch):
            out = []
            for fn, blob in batch:
                if fn == "bad.png":
                    raise RuntimeError("server 500")
                out.append(
                    f"https://img.example/{hashlib.md5(blob).hexdigest()[:8]}/{fn}"
                )
            return out

        return tp

    images = spark.createDataFrame(
        [("a.png", b"aaa"), ("b.jpg", b"bbb"), ("bad.png", b"xxx")],
        "filename string, content binary",
    )
    up = upload_images(images, transport=make_transport(), batch_size=1)
    rows = {r.filename: r for r in up.collect()}
    assert rows["a.png"].served_url.startswith("https://img.example/")
    assert rows["a.png"].n_bytes == 3 and rows["a.png"].error is None
    assert rows["bad.png"].served_url is None
    assert "server 500" in rows["bad.png"].error

    docs = spark.createDataFrame(
        [(1, "see ![x](local/a.png) and ![y](local/bad.png)")],
        "doc_id long, text string",
    )
    ok = up.filter(F.col("served_url").isNotNull())
    out = rewrite_image_refs(docs, ok).collect()[0]["text"]
    assert "img.example" in out and "local/a.png" not in out
    assert "local/bad.png" in out  # failed upload: ref untouched


def test_validate_image_refs_p13_semantics(spark):
    """P13 (validate_image_refs): scheme guard, checker verdicts,
    beyond-cap default-VALID, one check per distinct URL, and
    prefix-safe tag removal — reference 多数据源获取数据.py:570-598."""
    from data_pipeline_childcare_spark.functions.markdown import validate_image_refs

    rows = [
        # dead ref removed; live kept; non-http removed; a longer URL
        # sharing the dead one's prefix must survive the removal
        (1, "a ![x](http://h/dead.png) b ![y](http://h/dead.png2) "
            "c ![z](ftp://h/f) d ![k](http://h/live.png) e"),
        (2, "no refs at all"),
        # the same dead URL in a second doc: still one distinct check
        (3, "again ![x](http://h/dead.png) done"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_checked = spark.sparkContext.accumulator(0)

    def checker(urls):
        n_checked.add(len(urls))
        return ["dead.png" != u.rsplit("/", 1)[-1] for u in urls]

    got = {r["doc_id"]: r["text"] for r in validate_image_refs(df, checker).collect()}
    assert got[1] == "a  b ![y](http://h/dead.png2) c  d ![k](http://h/live.png) e"
    assert got[2] == "no refs at all"
    assert got[3] == "again  done"
    # executors probed each distinct http URL exactly once (3 distinct
    # across the corpus — the shared dead URL was NOT re-checked)
    assert n_checked.value == 3


def test_validate_image_refs_beyond_cap_default_valid(spark):
    from data_pipeline_childcare_spark.functions.markdown import validate_image_refs

    # 4 distinct refs, cap=2: only the first two (reading order) are
    # checked; the checker fails everything, so refs 3 and 4 survive
    # on the reference's beyond-cap default
    text = " ".join(f"![i](http://h/u{i}.png)" for i in range(4))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")

    def reject_all(urls):
        return [False for _ in urls]

    out = validate_image_refs(df, reject_all, cap=2).collect()[0]["text"]
    assert out == "  ![i](http://h/u2.png) ![i](http://h/u3.png)"


def test_validate_image_refs_preserves_duplicate_rows(spark):
    """Cardinality contract: the re-fold groups on a synthetic row
    key, so two FULLY IDENTICAL input rows stay two output rows (a
    groupBy over the data columns would silently collapse them)."""
    from data_pipeline_childcare_spark.functions.markdown import validate_image_refs

    rows = [
        (1, "x ![a](http://h/dead.png) y"),
        (1, "x ![a](http://h/dead.png) y"),  # verbatim duplicate row
        (2, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def reject_all(urls):
        return [False for _ in urls]

    out = validate_image_refs(df, reject_all).collect()
    assert len(out) == 3
    texts = sorted(r["text"] for r in out if r["doc_id"] == 1)
    assert texts == ["x  y", "x  y"]
    assert set(out[0].asDict().keys()) == {"doc_id", "text"}  # no key leak
