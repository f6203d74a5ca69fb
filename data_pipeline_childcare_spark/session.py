"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` in one JVM; the same builder settings
are what we would ship to a 1000-executor cluster: AQE on (runtime
shuffle-partition coalescing, broadcast-join conversion, skew-join
splitting), Arrow for every pandas-UDF exchange, UTC session time so
results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-pipeline-childcare-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Parameters default from env so the driver harness and bench can
    steer parallelism: ``SPARK_GRAFT_CPUS`` sets local core count and
    the shuffle-partition count.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # One shuffle partition per core locally. On a real cluster this
        # is a starting point only — AQE coalesces small partitions and
        # splits skewed ones at runtime, so the static number matters
        # far less than having AQE on.
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-first coalescing: collapse small post-shuffle partitions
        # to the advisory size instead of preserving parallelism — cuts
        # per-task scheduling overhead ~30% on small/medium stages and
        # is the right call at 100 TB too (tasks stay ~64 MB)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
        # CollectLimit defaults to scanning ONE partition, then
        # scaling up job-by-job until the limit is satisfied — the
        # guarded model-collects (tokenizer cost/piece tables:
        # limit(200k).collect() on vocab-sized frames) never satisfy
        # their sentinel limit, so every collect paid the full
        # incremental ladder (measured +0.6 s per collect on warm
        # caches). Scanning all partitions in one parallel job is
        # strictly better here; the guard still triggers after that
        # single pass when the contract is violated.
        .config("spark.sql.limit.initialNumPartitions", str(max(cpus, 32)))
        # By default AQE is DISABLED under persist() (cached plan
        # output partitioning is pinned), so every cached model-sized
        # table materializes at the static shuffle-partition count and
        # all downstream stages over it schedule that many tasks.
        # Allowing AQE to re-plan cached output gets the same
        # size-first coalescing the uncached path enjoys; results are
        # partition-count-invariant by engine discipline (fixed-point
        # integer math, explicit orderings), enforced by the hostile-
        # session suite which runs everything at 7 partitions.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # The engine's overflow contract (e.g. er.py audit casts:
        # decimal→long THROWS CAST_OVERFLOW instead of wrapping or
        # nulling) is an ANSI-mode behavior. Spark 4.x defaults ANSI
        # on, but a 3.x deployment defaults it OFF and would silently
        # return NULL from the same casts — pin it so the documented
        # fail-loud behavior is enforced, not inherited from the
        # engine default.
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate turns every explode(f(text)) into an
        # inferred `size(f(text))>0 AND isnotnull(f(text))` filter that
        # predicate-pushdown then drags BELOW the spread_partitions
        # exchange — so the full tokenize/shingle expression evaluates
        # twice per row in the (often single-partition) scan stage, on
        # one core, to decide a filter that removes nothing: our shingle
        # builders never return empty arrays, and Generate(outer=false)
        # already skips empties. Excluding the rule leaves exactly one
        # post-shuffle evaluation on full parallelism. Semantics are
        # unchanged (the inferred filter is redundant with Generate);
        # measured 1.17 s of single-task CPU removed from the shingle
        # pipelines at sf0.1.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Test parquet carries TIMESTAMP(NANOS) columns; this maps them
        # to TIMESTAMP_NTZ (naive, like the DuckDB oracle) instead of
        # failing the scan with PARQUET_TYPE_ILLEGAL.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
