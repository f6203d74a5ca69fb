"""Multi-format document parsing (SURVEY.md §2.1 S6-S14).

The reference sniffs content type (extension + MIME + magic bytes) and
dispatches to 12 per-format parsers producing Markdown. Spark-first
restatement:

- the corpus enters via ``spark.read.format("binaryFile")`` (path,
  modificationTime, length, content) — a splittable scan with
  pushed-down path globs;
- format sniffing is a pure column dispatch (`when/otherwise` over
  extension + magic bytes);
- light formats (TXT/MD/JSON/XML/CSV) parse in an Arrow-batched
  ``mapInPandas`` with the reference's 7-encoding fallback chain and
  size caps — pure stdlib, fully implemented;
- OOXML formats (DOCX/XLSX/PPTX) are zip+XML: parsed for real with
  the stdlib in ``sources.office`` — no external library needed;
- PDF runs the reference algorithm when ``fitz`` is importable
  (``office.parse_pdf_bytes``); only when no PDF engine exists does
  it emit a clearly marked deterministic STUB payload so the
  pipeline shape stays testable;
- images get header-sniffed metadata (stdlib) plus OCR when
  PIL/pytesseract are present.

Caps mirror the reference: 20 MB/file, 500 CSV rows, 50k JSON chars,
100k XML chars, 80k output chars (多数据源获取数据.py:476,614-619,1445).
"""

from __future__ import annotations

import csv
import io
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.sources import office

ENCODING_CHAIN = ("utf-8", "gbk", "gb18030", "big5", "latin-1")

MAX_FILE_BYTES = 20 * 1024 * 1024
MAX_CSV_ROWS = 500
MAX_JSON_CHARS = 50_000
MAX_XML_CHARS = 100_000
MAX_OUT_CHARS = 80_000

PARSED_SCHEMA = (
    "path string, fmt string, parser string, content string, n_bytes long, error string"
)

_EXT_TO_FMT = {
    "txt": "txt", "md": "md", "markdown": "md",
    "json": "json", "xml": "xml", "csv": "csv",
    "pdf": "pdf", "docx": "docx", "doc": "docx",
    "pptx": "pptx", "xlsx": "xlsx", "xls": "xlsx",
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "html": "html", "htm": "html",
}


def sniff_format(path_col, content_col):
    """Extension first, magic bytes as tie-breaker (reference sniffs
    HEAD content-type + extension; PK\\x03\\x04 marks OOXML/zip —
    多数据源获取数据.py:914-956)."""
    ext = F.lower(F.regexp_extract(path_col, r"\.([A-Za-z0-9]+)$", 1))
    fmt = F.lit(None).cast("string")
    for e, f_ in _EXT_TO_FMT.items():
        fmt = F.when(ext == e, F.lit(f_)).otherwise(fmt)
    magic = F.substring(content_col, 1, 4)
    return (
        F.when(fmt.isNotNull(), fmt)
        .when(magic == F.lit(b"%PDF"), F.lit("pdf"))
        .when(magic == F.lit(bytes([0x50, 0x4B, 0x03, 0x04])), F.lit("xlsx"))
        .otherwise(F.lit("txt"))
    )


def decode_bytes(data: bytes) -> str:
    """7-encoding fallback chain (多数据源获取数据.py:1054-1060)."""
    for enc in ENCODING_CHAIN:
        try:
            return data.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace")


# --- per-format parsers (bytes → markdown) ---------------------------------


def _parse_txt(data: bytes) -> str:
    return decode_bytes(data)


def _parse_json(data: bytes) -> str:
    text = decode_bytes(data)[:MAX_JSON_CHARS]
    try:
        pretty = json.dumps(json.loads(text), ensure_ascii=False, indent=2)
    except Exception:  # noqa: BLE001
        pretty = text
    return f"```json\n{pretty[:MAX_JSON_CHARS]}\n```"


def _parse_xml(data: bytes) -> str:
    return f"```xml\n{decode_bytes(data)[:MAX_XML_CHARS]}\n```"


def _escape_cell(v: str) -> str:
    return v.replace("|", "\\|").replace("\n", " ")[:80]


def _parse_csv(data: bytes) -> str:
    """CSV → markdown table, dialect-sniffed, 500-row cap
    (多数据源获取数据.py:959-977)."""
    text = decode_bytes(data)
    sample = text[:4096]
    try:
        dialect = csv.Sniffer().sniff(sample)
    except csv.Error:
        dialect = csv.excel
    rows = list(csv.reader(io.StringIO(text), dialect))[: MAX_CSV_ROWS + 1]
    if not rows:
        return ""
    width = len(rows[0])
    out = ["| " + " | ".join(_escape_cell(c) for c in rows[0]) + " |"]
    out.append("|" + " --- |" * width)
    for r in rows[1:]:
        out.append("| " + " | ".join(_escape_cell(c) for c in r) + " |")
    return "\n".join(out)


def _parse_html(data: bytes) -> str:
    """Main-content extraction. trafilatura when present (S12), else a
    stdlib tag-stripper fallback — real enough for cleaning-pipeline
    input, clearly inferior to the library path."""
    text = decode_bytes(data)
    try:
        import trafilatura  # noqa: PLC0415

        out = trafilatura.extract(text, favor_recall=True)
        if out:
            return out
    except ImportError:
        pass
    import re as _re  # noqa: PLC0415

    no_script = _re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", text)
    stripped = _re.sub(r"(?s)<[^>]+>", " ", no_script)
    return _re.sub(r"[ \t]+", " ", stripped).strip()


_PARSERS = {
    "txt": _parse_txt,
    "md": _parse_txt,
    "json": _parse_json,
    "xml": _parse_xml,
    "csv": _parse_csv,
    "html": _parse_html,
    "pdf": office.parse_pdf_bytes,
    "docx": office.parse_docx_bytes,
    "pptx": office.parse_pptx_bytes,
    "xlsx": office.parse_xlsx_bytes,
    "image": office.parse_image_bytes,
}


def _parse_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for path, fmt, content in zip(pdf["path"], pdf["fmt"], pdf["content"]):
            n = len(content) if content is not None else 0
            if n > MAX_FILE_BYTES:
                out.append((path, fmt, "cap", None, n, f"file exceeds {MAX_FILE_BYTES} bytes"))
                continue
            parser = _PARSERS.get(fmt, _parse_txt)
            try:
                md = parser(bytes(content))[:MAX_OUT_CHARS]
                out.append((path, fmt, parser.__name__, md, n, None))
            except Exception as e:  # noqa: BLE001
                out.append((path, fmt, parser.__name__, None, n, f"{type(e).__name__}: {e}"))
        yield pd.DataFrame(
            out, columns=["path", "fmt", "parser", "content", "n_bytes", "error"]
        )


def read_documents(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """binaryFile scan → sniffed format column. The scan prunes on
    pathGlobFilter server-side; content bytes stay columnar."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select("path", "length", "content").withColumn(
        "fmt", sniff_format(F.col("path"), F.col("content"))
    )


def parse_documents(docs: DataFrame) -> DataFrame:
    """(path, fmt, content) → parsed markdown rows via Arrow-batched
    mapInPandas (one python worker pass per partition, no shuffle)."""
    return docs.select("path", "fmt", "content").mapInPandas(
        _parse_partition, schema=PARSED_SCHEMA
    )
