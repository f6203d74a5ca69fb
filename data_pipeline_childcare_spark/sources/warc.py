"""WARC (Web ARChive, ISO 28500) ingestion — the container format of
Common Crawl and every serious web-crawl corpus, i.e. the actual
on-disk shape of "100 TB of training data". A WARC file is a
sequence of records (warcinfo / request / response / metadata ...),
each a header block plus a Content-Length-delimited payload; crawl
archives store one gzip member per record, concatenated.

Spark shape: ``spark.read.format("binaryFile")`` (or any source that
yields one blob per WARC file/segment) → :func:`read_warc_responses`
runs the stdlib parser in Arrow batches (``mapInPandas``) and emits
one row per HTTP *response* record with the HTTP layer already
split: (path, record_id, target_uri, http_status, http_content_type,
body). Bodies stay ``binary`` — hand them to
``sources.documents.parse_documents`` for the format-sniffed text
extraction, or to the multimodal decoders. Per-record corruption
degrades to an error row, never a failed task.

Everything is stdlib (``gzip`` handles the multi-member stream); no
warcio dependency.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _gunzip_capped(data: bytes, max_bytes: int) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, raising
    ValueError once the decompressed size exceeds ``max_bytes`` — the
    same zip-bomb discipline as archives.extract_zip's member cap."""
    import io

    out: list[bytes] = []
    total = 0
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        while True:
            chunk = gz.read(1 << 20)
            if not chunk:
                break
            total += len(chunk)
            if total > max_bytes:
                raise ValueError(
                    f"WARC gzip stream exceeds {max_bytes} decompressed bytes"
                )
            out.append(chunk)
    return b"".join(out)


def parse_warc(
    data: bytes,
    max_records: int | None = None,
    max_decompressed_bytes: int = 256 * 1024 * 1024,
) -> list[dict]:
    """Parse WARC bytes (plain or gzip, incl. member-per-record
    multi-member gzip) → list of records:
    ``{"headers": {lowercased: value}, "content": bytes}``.
    Malformed input raises ValueError (never struct/Index errors).
    ``max_decompressed_bytes`` caps the inflated stream so a
    gzip-bombed segment fails loudly instead of exhausting executor
    memory (mirrors archives.py's max_member_bytes guard)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_capped(data, max_decompressed_bytes)
        except ValueError:
            raise
        except Exception as exc:  # noqa: BLE001
            raise ValueError(f"corrupt WARC gzip stream: {exc}") from exc
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        eol = data.find(b"\n", pos)
        version = (data[pos:eol] if eol >= 0 else data[pos:]).strip()
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {version[:20]!r}")
        if eol < 0:
            raise ValueError("WARC header block truncated")
        pos = eol + 1
        headers: dict[str, str] = {}
        while pos < n:
            eol = data.find(b"\n", pos)
            if eol < 0:
                raise ValueError("WARC header block truncated")
            line = data[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                    "latin-1"
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError as exc:
            raise ValueError("WARC Content-Length not an integer") from exc
        if length < 0 or pos + length > n:
            raise ValueError("WARC record payload exceeds available bytes")
        records.append({"headers": headers, "content": data[pos : pos + length]})
        pos += length
        if max_records is not None and len(records) >= max_records:
            break
    return records


def split_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response payload → (status, content-type, body). A payload
    that is not an HTTP message (e.g. resource records) comes back as
    (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    # the header/body boundary is whichever blank line comes FIRST:
    # bare-LF headers (old servers, common in real crawls) would
    # otherwise split at a CRLFCRLF inside the body
    crlf = payload.find(b"\r\n\r\n")
    lf = payload.find(b"\n\n")
    if crlf >= 0 and (lf < 0 or crlf <= lf):
        sep, body_start = crlf, crlf + 4
    elif lf >= 0:
        sep, body_start = lf, lf + 2
    else:
        sep, body_start = -1, len(payload)
    head = payload[: sep if sep >= 0 else len(payload)]
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    try:
        status: int | None = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        if b":" in line:
            k, v = line.split(b":", 1)
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode("latin-1")
                break
    return status, ctype, payload[body_start:]


WARC_RESPONSES_SCHEMA = (
    "path string, record_id string, target_uri string, http_status int, "
    "http_content_type string, body binary, error string"
)


def read_warc_responses(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Explode WARC blobs into one row per HTTP *response* record
    (Arrow batches; see module docstring). A blob that fails to parse
    yields a single error row with NULL body so a 100 TB crawl's
    corrupt segments surface as data, not task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                try:
                    recs = parse_warc(bytes(data))
                except Exception as exc:  # noqa: BLE001
                    rows.append((path, None, None, None, None, None, str(exc)))
                    continue
                for rec in recs:
                    h = rec["headers"]
                    if h.get("warc-type") != "response":
                        continue
                    status, ctype, body = split_http_response(rec["content"])
                    rows.append(
                        (
                            path,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            status,
                            ctype,
                            body,
                            None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_id",
                    "target_uri",
                    "http_status",
                    "http_content_type",
                    "body",
                    "error",
                ],
            )

    return df.select(path_col, content_col).mapInPandas(run, schema=WARC_RESPONSES_SCHEMA)


def warc_documents(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """WARC blobs → parsed text documents, end-to-end: response
    records exploded, the parse format taken from the HTTP
    Content-Type (the crawl's own signal) with URL-extension/magic
    sniffing as fallback, bodies through the same Arrow-batched
    format-dispatch parser every other source uses
    (``sources.documents.parse_documents``). This is the
    crawl-corpus → clean-text entry point of the pipeline."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_pipeline_childcare_spark.sources.documents import (  # noqa: PLC0415
        parse_documents,
        sniff_format,
    )

    resp = read_warc_responses(df, path_col, content_col).filter(
        F.col("error").isNull() & F.col("body").isNotNull()
    )
    ct = F.lower(F.coalesce(F.col("http_content_type"), F.lit("")))
    fmt_ct = (
        F.when(ct.contains("text/html"), F.lit("html"))
        .when(ct.contains("application/json"), F.lit("json"))
        .when(ct.contains("application/pdf"), F.lit("pdf"))
        .when(ct.contains("text/csv"), F.lit("csv"))
        .when(ct.contains("text/markdown"), F.lit("md"))
        .when(ct.contains("text/plain"), F.lit("txt"))
        .otherwise(F.lit(None).cast("string"))
    )
    doc_path = F.coalesce(F.col("target_uri"), F.col("path"))
    docs = resp.select(
        doc_path.alias("path"),
        F.coalesce(fmt_ct, sniff_format(doc_path, F.col("body"))).alias("fmt"),
        F.col("body").alias("content"),
    )
    return parse_documents(docs)
