"""Archive-corpus ingestion: ZIP and TAR(.gz) blobs → one row per
member file. Document dumps very often arrive as archives-of-files
(a zip per crawl shard, a tar.gz per dataset release); this explodes
them into the (path, content) shape every downstream source consumer
(``parse_documents``, the multimodal decoders, WARC if nested)
already takes.

Arrow-batched ``mapInPandas`` like the other binary sources — stdlib
``zipfile``/``tarfile`` over in-memory buffers, no temp files. A
corrupt archive degrades to a single error row; a corrupt MEMBER is
skipped with the archive's remaining members still extracted (the
posture a 100 TB ingest needs — one truncated member must not sink
its shard). Directories and zero-byte entries are dropped;
``max_member_bytes`` caps decompressed member size so a zip bomb
cannot OOM an executor.
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ARCHIVE_MEMBERS_SCHEMA = (
    "path string, member string, content binary, error string"
)


def iter_archive_members(
    data: bytes, max_member_bytes: int = 64 * 1024 * 1024
) -> Iterator[tuple[str, bytes]]:
    """Yield (member_name, content) from ZIP / TAR / TAR.GZ bytes.
    Raises ValueError for unrecognized or corrupt containers."""
    buf = io.BytesIO(data)
    if data[:4] == b"PK\x03\x04" or data[:4] == b"PK\x05\x06":
        try:
            with zipfile.ZipFile(buf) as zf:
                for info in zf.infolist():
                    if info.is_dir() or info.file_size == 0:
                        continue
                    if info.file_size > max_member_bytes:
                        continue
                    try:
                        yield info.filename, zf.read(info)
                    except Exception:  # noqa: BLE001 — bad member, keep going
                        continue
        except zipfile.BadZipFile as exc:
            raise ValueError(f"corrupt ZIP: {exc}") from exc
        return
    # tar / tar.gz (tarfile sniffs both); gzip magic or ustar block
    looks_tar = (
        data[:2] == b"\x1f\x8b" or (len(data) > 262 and data[257:262] == b"ustar")
    )
    if not looks_tar:
        raise ValueError("not a ZIP or TAR archive")
    try:
        with tarfile.open(fileobj=buf, mode="r:*") as tf:
            for member in tf:
                if not member.isfile() or member.size == 0:
                    continue
                if member.size > max_member_bytes:
                    continue
                try:
                    f = tf.extractfile(member)
                    if f is None:
                        continue
                    yield member.name, f.read()
                except Exception:  # noqa: BLE001
                    continue
    # EOFError / zlib.error / BadGzipFile(OSError) leak from the gzip
    # layer on truncated .tar.gz streams — all must honor the
    # ValueError-only contract, not just tarfile's own errors
    except (tarfile.TarError, EOFError, OSError) as exc:
        raise ValueError(f"corrupt TAR: {exc}") from exc
    except Exception as exc:  # noqa: BLE001  (zlib.error and friends)
        raise ValueError(f"corrupt TAR stream: {exc!r}") from exc


def read_archive_members(
    df: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    max_member_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Explode archive blobs into per-member rows (see module
    docstring). Output: (path, member, content, error)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, data in zip(pdf[path_col], pdf[content_col]):
                try:
                    for member, content in iter_archive_members(
                        bytes(data), max_member_bytes
                    ):
                        rows.append((path, member, content, None))
                except Exception as exc:  # noqa: BLE001
                    rows.append((path, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["path", "member", "content", "error"]
            )

    return df.select(path_col, content_col).mapInPandas(
        run, schema=ARCHIVE_MEMBERS_SCHEMA
    )


def archive_documents(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Archive blobs → parsed text documents: members exploded, then
    the same format-dispatch parse chain as every other source
    (member name drives the extension sniff)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_pipeline_childcare_spark.sources.documents import (  # noqa: PLC0415
        parse_documents,
        sniff_format,
    )

    members = read_archive_members(df, path_col, content_col).filter(
        F.col("error").isNull()
    )
    docs = members.select(
        F.concat_ws("::", F.col("path"), F.col("member")).alias("path"),
        sniff_format(F.col("member"), F.col("content")).alias("fmt"),
        F.col("content"),
    )
    return parse_documents(docs)
