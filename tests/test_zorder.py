"""Z-order clustering: Morton-key correctness and the MEASURED
file-pruning win — the reason the layout pass exists. Zone maps are
read from the real parquet footers (pyarrow), not simulated."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

import data_pipeline_childcare_spark as eng
from data_pipeline_childcare_spark.io import write_zordered, zorder_value


def test_zorder_value_interleaves_bits(spark):
    rows = spark.range(1).select(
        zorder_value(F.lit(0b1010), F.lit(0b0110), bits=4).alias("z")
    ).collect()
    # x bits land on even positions, y bits on odd:
    # x=1010, y=0110 → z = 01 10 11 00 (y3x3 y2x2 y1x1 y0x0) = 0b01101100
    assert rows[0].z == 0b01101100


def test_zorder_value_preserves_locality_monotone_corners(spark):
    # (0,0) → 0; (max,max) → all ones
    rows = spark.range(1).select(
        zorder_value(F.lit(0), F.lit(0), bits=4).alias("lo"),
        zorder_value(F.lit(15), F.lit(15), bits=4).alias("hi"),
    ).collect()
    assert rows[0].lo == 0 and rows[0].hi == 255


def _overlapping_files(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] zone overlaps [lo,hi], total files) from
    the real parquet footers."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        if mx >= lo and mn <= hi:
            hit += 1
    return hit, len(files)


def test_zordered_layout_prunes_2d_ranges(spark, tmp_path):
    """The measured claim: under a 2-D range predicate, the z-ordered
    layout's zone maps rule out most files on BOTH dimensions, while
    a single-column sort only prunes its own column; correctness is
    unchanged (same filtered rows either way)."""
    ev = eng.load_table(spark, "events", "/root/testdata/sf0.01").select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day"),
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, "user_id", "day", bits=8, n_files=16)
    # linear baseline: sorted by user_id only, same file count
    ev.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(lpath)

    # narrow 2-D box: ~1/8 of each dimension
    u_lo, u_hi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    d_lo, d_hi = ev.agg(F.min("day"), F.max("day")).first()
    u_mid, d_mid = (u_lo + u_hi) // 2, (d_lo + d_hi) // 2
    u_w, d_w = max((u_hi - u_lo) // 16, 1), max((d_hi - d_lo) // 16, 1)
    box = (u_mid, u_mid + u_w, d_mid, d_mid + d_w)

    zu, zn = _overlapping_files(zpath, "user_id", box[0], box[1])
    zd, _ = _overlapping_files(zpath, "day", box[2], box[3])
    lu, ln = _overlapping_files(lpath, "user_id", box[0], box[1])
    ld, _ = _overlapping_files(lpath, "day", box[2], box[3])
    # linear layout: day zones are useless (every file overlaps)
    assert ld == ln
    # z-order: BOTH dimensions prune — strictly fewer candidate files
    # than the linear layout's user-only pruning on the conjunction
    assert min(zu, zd) < ln
    assert zd < ln  # the dimension linear sorting abandons

    # correctness: identical filtered result either way
    pred = (
        (F.col("user_id").between(box[0], box[1]))
        & (F.col("day").between(box[2], box[3]))
    )
    a = spark.read.parquet(zpath).filter(pred).count()
    b = spark.read.parquet(lpath).filter(pred).count()
    c = ev.filter(pred).count()
    assert a == b == c


def test_zorder_value_n_matches_2d_and_extends_3d(spark):
    from data_pipeline_childcare_spark.io import zorder_value_n

    rows = spark.range(1).select(
        zorder_value_n([F.lit(0b1010), F.lit(0b0110)], bits=4).alias("z2"),
        zorder_value(F.lit(0b1010), F.lit(0b0110), bits=4).alias("z2ref"),
        zorder_value_n([F.lit(1), F.lit(1), F.lit(1)], bits=2).alias("z3"),
    ).collect()
    assert rows[0].z2 == rows[0].z2ref  # N=2 degenerates to the pair form
    # three dims, value 1 each: bit 0 of dims 0,1,2 → positions 0,1,2
    assert rows[0].z3 == 0b111


def test_compact_parquet_dir_small_files(spark, tmp_path):
    """Compaction: 40 one-row files → a handful of right-sized files,
    rows exactly preserved, second pass a policy no-op."""
    from data_pipeline_childcare_spark.io import (
        compact_parquet_dir,
        parquet_file_inventory,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}" * 10) for i in range(40)], "id long, val string"
    )
    # many tiny files (the streaming-sink shape; AQE may coalesce a
    # few of the 40 requested partitions — still far too many files)
    df.repartition(40).write.parquet(path)
    before = parquet_file_inventory(spark, path)
    assert len(before) >= 20
    total = sum(sz for _, sz in before)

    stats = compact_parquet_dir(spark, path, target_file_bytes=total // 3 + 1)
    assert stats["compacted"] is True
    assert stats["files_before"] == len(before)
    assert 1 <= stats["files_after"] <= 4
    # content identical (parquet dirs are unordered by contract)
    got = sorted(
        (r["id"], r["val"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [(i, f"v{i}" * 10) for i in range(40)]
    # no leftover temp/backup dirs
    import os

    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")

    # already within policy (every file ≥ half this tiny target) →
    # untouched no-op; note the FIRST call's byte total shrank a lot
    # (tiny-file footer overhead vanished), so re-checking against the
    # original target could legitimately re-compact — policy is
    # evaluated against current sizes, as it should be
    again = compact_parquet_dir(spark, path, target_file_bytes=2)
    assert again["compacted"] is False
    assert again["files_after"] == stats["files_after"]


def test_rowgroup_stats_reads_zone_maps(spark, tmp_path):
    """The footer profiler agrees with the data and shows the layout
    difference: sorted-by-id files carry disjoint [min,max] id spans,
    shuffled files overlap."""
    from data_pipeline_childcare_spark.io import rowgroup_stats

    sorted_path = str(tmp_path / "sorted")
    shuffled_path = str(tmp_path / "shuffled")
    df = spark.range(0, 4000).withColumn("v", (F.col("id") * 7) % 100)
    df.repartitionByRange(4, "id").write.parquet(sorted_path)
    df.repartition(4).write.parquet(shuffled_path)

    st = rowgroup_stats(spark, sorted_path, columns=["id"]).collect()
    assert sum(r["n_rows"] for r in st) == 4000
    assert all(r["null_count"] == 0 for r in st)
    spans = sorted((int(r["min_value"]), int(r["max_value"])) for r in st)
    # range-partitioned: spans are disjoint and ordered
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert spans[0][0] == 0 and spans[-1][1] == 3999

    sh = rowgroup_stats(spark, shuffled_path, columns=["id"]).collect()
    sh_spans = [(int(r["min_value"]), int(r["max_value"])) for r in sh]
    # round-robin: every span covers ~the whole domain (no pruning)
    assert all(hi - lo > 3000 for lo, hi in sh_spans)
