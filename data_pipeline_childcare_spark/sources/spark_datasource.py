"""The paginated registry scan as a REAL Spark data source.

``HttpTuoyuRegistrySource`` (connectors.py, reference
tuoyu_scraper.py:24-97) fans pages out driver-side, matching the
reference's single-process loop. This module lifts the same wire
contract into Spark's Python DataSource API (pyspark 4.x,
``pyspark.sql.datasource``), which is the idiomatic 100 TB shape:

- ``spark.read.format("tuoyu_registry")`` — page 1 is fetched ONCE at
  planning time to discover ``totalPage`` (exactly the reference's
  discovery step); the remaining pages are chunked into
  ``InputPartition``s and fetched ON THE EXECUTORS, so a
  6,000-page crawl parallelizes across the cluster instead of
  serializing through the driver.
- ``spark.readStream.format("tuoyu_registry")`` — the page counter is
  the streaming OFFSET: Spark checkpoints it, so a restarted crawl
  resumes from the last committed page, and a registry that GROWS
  between polls feeds new pages to later micro-batches — incremental
  ingestion with exactly-once bookkeeping delegated to Structured
  Streaming.

Rows are ``(page, record, error)`` where ``record`` is the raw
``dataList`` item as canonical JSON (sorted keys, non-ASCII
preserved): the registry's wire fields are free-form Chinese keys, so
the source's contract is transport + pagination + error discipline,
and schema-typing stays downstream (``from_json`` /
``sources/record_blocks.py``), exactly like Spark's own ``text``
source. Per-page failures degrade to an ``error`` row and the scan
continues (reference :46-47); ``max_consecutive_errors`` failures in
a row abort the PARTITION (batch: remaining pages emit explicit
skipped-error rows; streaming: the task RAISES so the offset range is
never committed and the next trigger refetches) — the connector's
systemic-outage guard, applied per executor chunk.

Hermetic testing: a ``fixture`` option points at a JSON file mapping
page numbers to response envelopes; the transport then never touches
a socket (the connector replay-tier discipline). Without ``fixture``
the connector's real HTTP transport is used.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "page int, record string, error string"


def _build_connector(options: dict):
    """Connector with the transport the options select: ``fixture``
    (page→envelope JSON file; missing page = transport fault) for
    hermetic runs, real HTTP otherwise. Constructed per call site —
    on the driver for discovery, on each executor for its chunk — so
    nothing non-picklable rides the partition objects."""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpTuoyuRegistrySource,
    )

    fixture = options.get("fixture")
    transport = None
    if fixture:
        with open(fixture, encoding="utf-8") as f:
            pages = json.load(f)

        def transport(url, params, _pages=pages):  # noqa: ANN001
            envelope = _pages.get(str(params["pageNum"]))
            if envelope is None:
                raise OSError(f"fixture has no page {params['pageNum']}")
            return envelope

    base_url = options.get("base_url") or (fixture and "fixture://registry")
    if not base_url:
        raise ValueError("tuoyu_registry requires a base_url option (or fixture)")
    return HttpTuoyuRegistrySource(
        base_url=base_url,
        timeout_s=float(options.get("timeout_s", 30.0)),
        max_retries=int(options.get("max_retries", 3)),
        backoff_s=float(options.get("backoff_s", 0.5)),
        transport=transport,
        sleeper=(lambda s: None) if fixture else None,
    )


def _read_pages(
    options: dict,
    pages: list[int],
    first_payload: dict | None = None,
    strict: bool = False,
) -> Iterator[tuple]:
    """Fetch ``pages`` through the connector's retry discipline and
    yield (page, record_json, error) tuples. ``first_payload`` lets
    the planner hand page 1's already-fetched responseData through
    the partition instead of paying the discovery call twice.

    Systemic-outage abort (``max_consecutive_errors`` failures in a
    row): in batch mode the partition STOPS FETCHING but still emits
    an error row for every remaining page, so nothing is silently
    absent from the output; in ``strict`` mode (the STREAMING reader)
    it raises instead — the task fails, the micro-batch's offsets are
    never committed, and the pages are refetched on the next trigger.
    Degrading would be wrong there: Spark commits the whole offset
    range once the batch succeeds, so skipped pages would be lost
    forever rather than visible as error rows."""
    src = _build_connector(options)
    page_size = int(options.get("page_size", 10))
    keyword = options.get("keyword", "")
    max_consecutive = int(options.get("max_consecutive_errors", 10))
    consecutive = 0
    for idx, page in enumerate(pages):
        try:
            if first_payload is not None and page == pages[0]:
                data = first_payload
            else:
                data = src.fetch_page(page, page_size, keyword)
            consecutive = 0
            for item in data.get("dataList", []):
                yield (page, json.dumps(item, ensure_ascii=False, sort_keys=True), None)
        except Exception as e:  # noqa: BLE001 — reference logs and continues
            consecutive += 1
            if consecutive >= max_consecutive:
                if strict:
                    raise RuntimeError(
                        f"aborting micro-batch: {consecutive} consecutive "
                        f"page failures (last: page {page}: {e})"
                    ) from e
                yield (page, None, str(e))
                yield (
                    page,
                    None,
                    f"aborted partition after {consecutive} consecutive page failures",
                )
                for skipped in pages[idx + 1 :]:
                    yield (skipped, None, "skipped: partition aborted upstream")
                return
            yield (page, None, str(e))


class _PagesPartition(InputPartition):
    def __init__(self, pages: list[int], first_payload: dict | None = None):
        self.pages = pages
        self.first_payload = first_payload


class TuoyuRegistryReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> list[InputPartition]:
        src = _build_connector(self.options)
        page_size = int(self.options.get("page_size", 10))
        keyword = self.options.get("keyword", "")
        first = src.fetch_page(1, page_size, keyword)

        def _as_int(v) -> int:
            try:
                return int(v)
            except (TypeError, ValueError):
                return 0

        total_page = _as_int(first.get("totalPage", 0))
        max_pages = self.options.get("max_pages")
        n_pages = max(1, total_page)
        if max_pages is not None:
            n_pages = min(n_pages, max(1, int(max_pages)))
        per_task = max(1, int(self.options.get("pages_per_task", 64)))
        parts: list[InputPartition] = []
        for lo in range(1, n_pages + 1, per_task):
            pages = list(range(lo, min(lo + per_task, n_pages + 1)))
            parts.append(_PagesPartition(pages, first if lo == 1 else None))
        return parts

    def read(self, partition: _PagesPartition) -> Iterator[tuple]:
        return _read_pages(self.options, partition.pages, partition.first_payload)


class TuoyuRegistryStreamReader(DataSourceStreamReader):
    """Page-counter offsets: ``{"page": n}`` = pages < n are
    committed. ``latestOffset`` re-discovers ``totalPage`` each poll,
    so a GROWING registry keeps feeding micro-batches and a restarted
    query resumes from the checkpointed page instead of re-crawling.
    Within a batch the new pages chunk into ``pages_per_task``
    partitions — executor-parallel fetch, same as the batch reader."""

    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self) -> dict:
        return {"page": 1}

    def _total_pages(self) -> int:
        src = _build_connector(self.options)
        first = src.fetch_page(
            1, int(self.options.get("page_size", 10)), self.options.get("keyword", "")
        )
        try:
            total = int(first.get("totalPage", 0))
        except (TypeError, ValueError):
            total = 0
        max_pages = self.options.get("max_pages")
        if max_pages is not None:
            total = min(total, int(max_pages))
        return max(1, total)

    def latestOffset(self) -> dict:
        # everything currently available; admission control for python
        # sources is partition-level (pages_per_task), not offset-level
        return {"page": self._total_pages() + 1}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["page"]), int(end["page"])
        if hi <= lo:
            return []
        per_task = max(1, int(self.options.get("pages_per_task", 64)))
        return [
            _PagesPartition(list(range(p, min(p + per_task, hi))))
            for p in range(lo, hi, per_task)
        ]

    def read(self, partition: _PagesPartition) -> Iterator[tuple]:
        return _read_pages(self.options, partition.pages, strict=True)

    def commit(self, end: dict) -> None:
        # offsets are page numbers; there is nothing source-side to
        # garbage-collect (the registry is the system of record)
        pass


class TuoyuRegistryDataSource(DataSource):
    """``spark.read.format("tuoyu_registry")`` — see module docstring.

    Options: ``base_url`` (required unless ``fixture``), ``page_size``,
    ``keyword``, ``max_pages``, ``pages_per_task`` (partition chunking), ``timeout_s``,
    ``max_retries``, ``backoff_s``, ``max_consecutive_errors``,
    ``fixture`` (hermetic page→envelope JSON)."""

    @classmethod
    def name(cls) -> str:
        return "tuoyu_registry"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return TuoyuRegistryReader(dict(self.options))

    def streamReader(self, schema) -> DataSourceStreamReader:
        return TuoyuRegistryStreamReader(dict(self.options))


# (register() is defined at module end, after both DataSource classes)


# --------------------------------------------------------------------------
# jsondump: the S21 JSON dump sink as a full DataSourceWriter — what it
# adds over df.write.json is the explicit COMMIT PROTOCOL surface:
# tasks stream to _temporary files and return commit messages; the
# driver renames winners into place and writes a _SUCCESS manifest
# (file list + row counts) only if EVERY task succeeded; abort deletes
# the temporaries — so readers gated on _SUCCESS never observe a
# partial or duplicated write, including under task retries (each
# attempt writes a distinct temp file; only the attempt whose commit
# message reaches the driver is renamed). Paths are local-FS here; a
# cluster deployment keeps the same rename-on-commit discipline on a
# shared filesystem or swaps renames for an object-store manifest.
# --------------------------------------------------------------------------
from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _JsonDumpCommit(WriterCommitMessage):
    def __init__(self, temp_file: str, n_rows: int):
        self.temp_file = temp_file
        self.n_rows = n_rows


class JsonDumpWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsondump requires a path option")
        self.overwrite = overwrite

    def write(self, iterator) -> _JsonDumpCommit:
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"task-{ctx.partitionId()}-{ctx.taskAttemptId()}-{uuid.uuid4().hex[:8]}.jsonl"
        tmp = os.path.join(tmp_dir, name)
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        row.asDict(recursive=True),
                        ensure_ascii=False,
                        sort_keys=True,
                        default=str,
                    )
                )
                f.write("\n")
                n += 1
        return _JsonDumpCommit(tmp, n)

    def commit(self, messages) -> None:
        import os
        import shutil
        import uuid

        if self.overwrite:
            for fn in os.listdir(self.path):
                if fn.startswith("part-") or fn == "_SUCCESS":
                    os.remove(os.path.join(self.path, fn))
        # append must ACCUMULATE: a per-job id keeps this commit's file
        # names disjoint from every earlier commit's (a bare part-00000
        # would os.replace-clobber a previous append), and the new
        # manifest carries the previous manifest's files forward so a
        # manifest-gated reader sees the union
        job = uuid.uuid4().hex[:8]
        prev_files, prev_total = [], 0
        success = os.path.join(self.path, "_SUCCESS")
        if not self.overwrite and os.path.exists(success):
            with open(success, encoding="utf-8") as f:
                prev = json.load(f)
            prev_files, prev_total = prev["files"], prev["total_rows"]
        files, total = [], 0
        for i, m in enumerate(messages):
            if m is None or m.n_rows == 0:
                if m is not None:
                    os.remove(m.temp_file)
                continue
            final = f"part-{job}-{i:05d}.jsonl"
            os.replace(m.temp_file, os.path.join(self.path, final))
            files.append({"file": final, "rows": m.n_rows})
            total += m.n_rows
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)
        manifest = {
            "files": prev_files + files,
            "total_rows": prev_total + total,
        }
        tmp_manifest = success + ".tmp"
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump(manifest, f, ensure_ascii=False, sort_keys=True)
        os.replace(tmp_manifest, success)

    def abort(self, messages) -> None:
        import os
        import shutil

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.temp_file)
                except OSError:
                    pass
        shutil.rmtree(os.path.join(self.path, "_temporary"), ignore_errors=True)


class JsonDumpStreamWriter(DataSourceStreamWriter):
    """Streaming flavor of the jsondump commit protocol: each
    micro-batch commits ATOMICALLY under its batchId —
    part-b<batch>-<task>.jsonl files plus a per-batch manifest
    _batch-<id>.json written only when every task of that batch
    succeeded. Batch REPLAYS after a failure are idempotent: a
    replayed batchId first deletes its own previous part files (the
    manifest records them), so exactly-once lands on top of Spark's
    at-least-once replay, which is precisely the foreachBatch
    discipline streaming/merge.py documents — here expressed at the
    sink-API level."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsondump requires a path option")

    def write(self, iterator) -> _JsonDumpCommit:
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        tmp_dir = os.path.join(self.path, "_temporary")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(
            tmp_dir,
            f"stream-{ctx.partitionId()}-{ctx.taskAttemptId()}-{uuid.uuid4().hex[:8]}.jsonl",
        )
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        row.asDict(recursive=True),
                        ensure_ascii=False,
                        sort_keys=True,
                        default=str,
                    )
                )
                f.write("\n")
                n += 1
        return _JsonDumpCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        import glob as _glob
        import os

        manifest_path = os.path.join(self.path, f"_batch-{batchId}.json")
        # replayed batch: drop EVERY part file carrying this batchId,
        # by glob rather than by reading the old manifest — a crash
        # between the renames and the manifest write would otherwise
        # leave orphans the manifest never recorded (rename-then-
        # manifest is not atomic across files; the glob makes the
        # cleanup independent of how far the dead attempt got)
        for stale in _glob.glob(os.path.join(self.path, f"part-b{batchId}-*.jsonl")):
            try:
                os.remove(stale)
            except OSError:
                pass
        files, total = [], 0
        for i, m in enumerate(messages):
            if m is None or m.n_rows == 0:
                if m is not None:
                    os.remove(m.temp_file)
                continue
            final = f"part-b{batchId}-{i:05d}.jsonl"
            os.replace(m.temp_file, os.path.join(self.path, final))
            files.append({"file": final, "rows": m.n_rows})
            total += m.n_rows
        tmp_manifest = manifest_path + ".tmp"
        with open(tmp_manifest, "w", encoding="utf-8") as f:
            json.dump({"files": files, "total_rows": total}, f, ensure_ascii=False, sort_keys=True)
        os.replace(tmp_manifest, manifest_path)

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.temp_file)
                except OSError:
                    pass


class JsonDumpDataSource(DataSource):
    """``df.write.format("jsondump").option("path", ...)`` — see the
    commit-protocol note above. Options: ``path`` (required)."""

    @classmethod
    def name(cls) -> str:
        return "jsondump"

    def schema(self) -> str:  # writer-only source; never inferred
        return SCHEMA

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonDumpWriter(dict(self.options), overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonDumpStreamWriter":
        return JsonDumpStreamWriter(dict(self.options))


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(TuoyuRegistryDataSource)
    spark.dataSource.register(JsonDumpDataSource)
