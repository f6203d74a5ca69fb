"""Image-upload sink (SURVEY.md §2.1 S15 — the side-effect half).

The reference batch-uploads extracted images to a serving endpoint
and rewrites document refs to the returned URLs
(多数据源获取数据.py:352-445). The rewrite dataflow lives in
``functions/markdown.py`` (oracled); this module supplies the upload
itself as a DISTRIBUTED side-effect stage: an Arrow-batched
``mapInPandas`` pass that posts bounded batches per executor task and
emits one result row per image — served URL on success, an error row
on failure (the document keeps its original ref; the rewrite join
simply finds no match).

Transport is injectable exactly like the connector family
(sources/connectors.py): ``transport(endpoint, batch)`` with
``batch = [(filename, bytes), ...]`` returning a list of served URLs
(None per failed item). The default transport posts with stdlib
urllib; tests inject deterministic fakes — no network in CI.

Scale shape: uploads parallelize across partitions; ``batch_size``
bounds per-request payload; per-item failures degrade to error rows
instead of failing the task (retry by re-running on the error rows —
the frame is idempotent input). Spark task retries re-post a
partition's batches; the serving side dedupes by content hash, which
is why the default filename key is the md5 of the content.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

UPLOAD_SCHEMA = "filename string, served_url string, n_bytes long, error string"


def default_transport(endpoint: str, batch: list) -> list:
    """POST each image to ``endpoint`` with stdlib urllib (one request
    per item; the reference posts multipart batches — servers differ,
    override via the injectable transport). Returns served URLs."""
    import urllib.request

    out = []
    for filename, content in batch:
        req = urllib.request.Request(
            endpoint,
            data=content,
            headers={
                "Content-Type": "application/octet-stream",
                "X-Filename": filename,
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out.append(resp.read().decode("utf-8").strip())
    return out


def upload_images(
    images: DataFrame,
    endpoint: str = "https://upload.invalid/images",
    transport: Callable | None = None,
    batch_size: int = 16,
    filename_col: str = "filename",
    content_col: str = "content",
) -> DataFrame:
    """(filename, content BINARY) → (filename, served_url, n_bytes,
    error): the upload side-effect executed executor-side in bounded
    batches. ``served_url`` is NULL (with ``error`` set) for items
    whose batch failed — downstream ``rewrite_image_refs`` then
    leaves those refs untouched."""
    tp = transport or default_transport

    def _run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            names = pdf[filename_col].tolist()
            blobs = pdf[content_col].tolist()
            rows = []
            for start in range(0, len(names), batch_size):
                chunk = list(
                    zip(names[start : start + batch_size], blobs[start : start + batch_size])
                )
                try:
                    urls = tp(endpoint, chunk)
                    if len(urls) != len(chunk):
                        raise ValueError(
                            f"transport returned {len(urls)} urls for {len(chunk)} items"
                        )
                except Exception as exc:  # degrade to error rows
                    urls = [None] * len(chunk)
                    err = f"{type(exc).__name__}: {exc}"
                else:
                    err = None
                for (fn, blob), url in zip(chunk, urls):
                    rows.append(
                        {
                            "filename": fn,
                            "served_url": url,
                            "n_bytes": len(blob) if blob is not None else 0,
                            "error": err if url is None else None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["filename", "served_url", "n_bytes", "error"]
            )

    return images.select(filename_col, content_col).mapInPandas(_run, UPLOAD_SCHEMA)


def content_filename(content: bytes, original: str) -> str:
    """Content-addressed filename (md5 prefix + original extension) —
    the dedupe-friendly key the serving side wants under task
    retries."""
    ext = original.rsplit(".", 1)[-1] if "." in original else "bin"
    return f"{hashlib.md5(content).hexdigest()[:16]}.{ext}"
