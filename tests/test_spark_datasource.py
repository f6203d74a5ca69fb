"""The tuoyu_registry Python DataSource: partition-parallel batch
scan + offset-checkpointed streaming crawl (sources/spark_datasource).

All hermetic via the ``fixture`` transport (page→envelope JSON file);
the wire shape matches connectors.HttpTuoyuRegistrySource's replay
and loopback suites (reference tuoyu_scraper.py:24-97).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F


def _envelope(page: int, n_rows: int, total_page: int, total_record: int) -> dict:
    return {
        "code": "000000",
        "responseData": {
            "totalRecord": total_record,
            "totalPage": total_page,
            "dataList": [
                {"机构名称": f"园{page}-{i}", "区域编号": f"{page}{i:02d}"}
                for i in range(n_rows)
            ],
        },
    }


def _write_fixture(tmp_path, pages: dict) -> str:
    p = tmp_path / "registry_fixture.json"
    p.write_text(json.dumps(pages, ensure_ascii=False), encoding="utf-8")
    return str(p)


@pytest.fixture()
def registered(spark):
    from data_pipeline_childcare_spark.sources.spark_datasource import register

    register(spark)
    return spark


def test_batch_scan_reads_all_pages_across_partitions(registered, tmp_path):
    spark = registered
    # 5 pages × 10 rows, last page short — chunked 2 pages/task so the
    # scan provably spans multiple input partitions
    pages = {str(p): _envelope(p, 2 if p == 5 else 10, 5, 42) for p in range(1, 6)}
    fx = _write_fixture(tmp_path, pages)
    df = (
        spark.read.format("tuoyu_registry")
        .option("fixture", fx)
        .option("pages_per_task", 2)
        .load()
    )
    rows = df.collect()
    assert len(rows) == 42
    assert {r["page"] for r in rows} == {1, 2, 3, 4, 5}
    assert all(r["error"] is None for r in rows)
    rec = json.loads(next(r["record"] for r in rows if r["page"] == 3))
    assert rec["机构名称"].startswith("园3-")
    # the page chunking is real partition parallelism, not one task
    assert df.rdd.getNumPartitions() == 3  # ceil(5/2)


def test_batch_scan_max_pages_and_dead_page_degrades_to_error_row(registered, tmp_path):
    spark = registered
    pages = {str(p): _envelope(p, 3, 4, 12) for p in (1, 2, 4)}  # page 3 missing
    fx = _write_fixture(tmp_path, pages)
    df = (
        spark.read.format("tuoyu_registry")
        .option("fixture", fx)
        .option("max_retries", 2)
        .load()
    )
    ok = df.filter(F.col("error").isNull())
    bad = df.filter(F.col("error").isNotNull()).collect()
    assert ok.count() == 9  # pages 1,2,4 × 3 rows
    assert [r["page"] for r in bad] == [3]
    assert "no page 3" in bad[0]["error"]

    capped = (
        spark.read.format("tuoyu_registry")
        .option("fixture", fx)
        .option("max_pages", 2)
        .load()
    )
    assert capped.count() == 6 and capped.agg(F.max("page")).first()[0] == 2


def test_batch_scan_consecutive_failures_abort_partition(registered, tmp_path):
    spark = registered
    # pages 2..6 all missing; with max_consecutive_errors=3 the single
    # partition yields page-1 rows, 3 error rows, then the abort marker
    pages = {"1": _envelope(1, 4, 6, 24)}
    fx = _write_fixture(tmp_path, pages)
    df = (
        spark.read.format("tuoyu_registry")
        .option("fixture", fx)
        .option("max_retries", 1)
        .option("max_consecutive_errors", 3)
        .option("pages_per_task", 64)
        .load()
    )
    rows = df.collect()
    assert sum(1 for r in rows if r["error"] is None) == 4
    errs = [r for r in rows if r["error"] is not None]
    # pages 2,3,4 fail (page 4 also carries the abort marker), pages
    # 5,6 emit explicit skipped rows — nothing is silently absent
    assert len(errs) == 6
    assert any("aborted partition after 3 consecutive page failures" in r["error"]
               for r in errs)
    skipped = [r["page"] for r in errs if r["error"].startswith("skipped:")]
    assert skipped == [5, 6]


def test_streaming_crawl_resumes_from_checkpoint(registered, tmp_path):
    """The page counter is the offset: the checkpoint persists
    progress, and a RESTARTED query continues from the committed page
    instead of re-crawling — the property that makes a recurring
    registry crawl incremental."""
    spark = registered
    pages = {str(p): _envelope(p, 2, 6, 12) for p in range(1, 7)}
    fx = _write_fixture(tmp_path, pages)
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_once() -> None:
        q = (
            spark.readStream.format("tuoyu_registry")
            .option("fixture", fx)
            .option("pages_per_task", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = spark.read.schema("page int, record string, error string").parquet(
        str(out)
    )
    got1 = {r["page"] for r in first.select("page").distinct().collect()}
    assert got1 == {1, 2, 3, 4, 5, 6}
    n1 = first.count()
    assert n1 == 12 and first.filter("error is not null").count() == 0

    # restart against the SAME checkpoint: offsets say page 7 is next,
    # no new pages exist, so nothing is re-emitted
    run_once()
    again = spark.read.schema("page int, record string, error string").parquet(
        str(out)
    )
    assert again.count() == n1


def test_stream_equals_batch_on_the_same_fixture(registered, tmp_path):
    """Certification shape: one availableNow streaming crawl lands
    exactly the batch scan's records (page counter offsets lose and
    duplicate nothing)."""
    spark = registered
    pages = {str(p): _envelope(p, 5, 4, 20) for p in range(1, 5)}
    fx = _write_fixture(tmp_path, pages)
    batch = {
        (r["page"], r["record"])
        for r in spark.read.format("tuoyu_registry").option("fixture", fx).load().collect()
    }
    out, ckpt = tmp_path / "sb_out", tmp_path / "sb_ckpt"
    q = (
        spark.readStream.format("tuoyu_registry")
        .option("fixture", fx)
        .option("pages_per_task", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["page"], r["record"])
        for r in spark.read.schema("page int, record string, error string")
        .parquet(str(out))
        .collect()
    }
    assert streamed == batch and len(batch) == 20


def test_jsondump_writer_commit_protocol(registered, tmp_path):
    """Tasks stream to _temporary, commit renames winners into place
    and writes a _SUCCESS manifest with per-file row counts; empty
    partitions produce no part files."""
    import os

    spark = registered
    out = tmp_path / "dump"
    out.mkdir()
    df = spark.createDataFrame(
        [(1, "机构甲"), (2, "机构乙"), (3, "机构丙")], "id long, name string"
    ).repartition(4)
    df.write.format("jsondump").option("path", str(out)).mode("append").save()
    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names and "_temporary" not in names
    manifest = json.loads((out / "_SUCCESS").read_text(encoding="utf-8"))
    assert manifest["total_rows"] == 3
    assert sum(f["rows"] for f in manifest["files"]) == 3
    rows = []
    for f in manifest["files"]:
        for line in (out / f["file"]).read_text(encoding="utf-8").splitlines():
            rows.append(json.loads(line))
    assert sorted(r["id"] for r in rows) == [1, 2, 3]
    assert {r["name"] for r in rows} == {"机构甲", "机构乙", "机构丙"}
    # 4 partitions, 3 rows -> at most 3 non-empty part files
    assert len(manifest["files"]) <= 3


def test_jsondump_writer_overwrite_replaces_previous_commit(registered, tmp_path):
    spark = registered
    out = tmp_path / "dump_ow"
    out.mkdir()
    a = spark.createDataFrame([(1, "x")], "id long, v string")
    b = spark.createDataFrame([(2, "y"), (3, "z")], "id long, v string")
    a.write.format("jsondump").option("path", str(out)).mode("append").save()
    b.write.format("jsondump").option("path", str(out)).mode("overwrite").save()
    manifest = json.loads((out / "_SUCCESS").read_text(encoding="utf-8"))
    assert manifest["total_rows"] == 2
    seen = []
    for f in manifest["files"]:
        for line in (out / f["file"]).read_text(encoding="utf-8").splitlines():
            seen.append(json.loads(line)["id"])
    assert sorted(seen) == [2, 3]


def test_jsondump_writer_abort_leaves_no_partial_output(registered, tmp_path):
    """A failing task aborts the job: no _SUCCESS, no part files, the
    _temporary dir swept — readers gated on the manifest never see a
    partial write."""
    import os

    from pyspark.sql import functions as F

    spark = registered
    out = tmp_path / "dump_fail"
    out.mkdir()

    @F.udf("long")
    def boom(v):
        if v == 2:
            raise RuntimeError("poisoned row")
        return v

    df = spark.createDataFrame([(1,), (2,), (3,)], "id long").select(
        boom("id").alias("id")
    )
    with pytest.raises(Exception):
        df.write.format("jsondump").option("path", str(out)).mode("append").save()
    names = os.listdir(out)
    assert "_SUCCESS" not in names
    assert not [n for n in names if n.startswith("part-")]
    # a retried attempt can still be flushing its temp file for a
    # moment after the job exception propagates — poll briefly
    import time

    for _ in range(20):
        leftovers = (
            os.listdir(out / "_temporary") if os.path.exists(out / "_temporary") else []
        )
        if not leftovers:
            break
        time.sleep(0.25)
    assert not leftovers


def test_jsondump_stream_writer_per_batch_manifests(registered, tmp_path):
    """Streaming sink flavor: each micro-batch lands part-b<id>-* files
    plus an atomic _batch-<id>.json manifest; totals across manifests
    equal the source rows."""
    import os

    spark = registered
    src = tmp_path / "src"
    out = tmp_path / "stream_dump"
    out.mkdir()
    a = spark.createDataFrame([(1, "一"), (2, "二")], "id long, v string")
    b = spark.createDataFrame([(3, "三")], "id long, v string")
    a.write.parquet(str(src / "f1"))
    b.write.parquet(str(src / "f2"))
    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.format("jsondump")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "jd_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    manifests = sorted(n for n in os.listdir(out) if n.startswith("_batch-"))
    # one manifest per micro-batch; the file source splits on PART
    # files so the exact batch count varies — what matters is >1 batch
    # and exactly-once totals across all of them
    assert len(manifests) >= 2
    total, ids = 0, []
    for mn in manifests:
        m = json.loads((out / mn).read_text(encoding="utf-8"))
        total += m["total_rows"]
        for fent in m["files"]:
            for line in (out / fent["file"]).read_text(encoding="utf-8").splitlines():
                ids.append(json.loads(line)["id"])
    assert total == 3 and sorted(ids) == [1, 2, 3]
    assert not os.path.exists(out / "_temporary") or not os.listdir(out / "_temporary")


def test_jsondump_writer_append_accumulates(registered, tmp_path):
    """Two append commits must UNION: per-job file prefixes keep names
    disjoint and the manifest carries earlier files forward."""
    spark = registered
    out = tmp_path / "dump_acc"
    out.mkdir()
    spark.createDataFrame([(1, "a")], "id long, v string").write.format(
        "jsondump"
    ).option("path", str(out)).mode("append").save()
    spark.createDataFrame([(2, "b")], "id long, v string").write.format(
        "jsondump"
    ).option("path", str(out)).mode("append").save()
    manifest = json.loads((out / "_SUCCESS").read_text(encoding="utf-8"))
    assert manifest["total_rows"] == 2
    ids = []
    for f in manifest["files"]:
        for line in (out / f["file"]).read_text(encoding="utf-8").splitlines():
            ids.append(json.loads(line)["id"])
    assert sorted(ids) == [1, 2]
