"""Office/binary document extraction bodies (SURVEY.md §2.1 S7-S10, S14).

The reference extracts Markdown from PDF/DOCX/PPTX/XLSX/images with
binary parser libraries (多数据源获取数据.py:667-1050). The OOXML
family (DOCX/XLSX/PPTX) is zip+XML, so those three are implemented
here with ONLY the stdlib (``zipfile`` + ``xml.etree``) — no external
dependency, fully functional in this container:

- DOCX (ref :765-838): document-order walk of ``word/document.xml``
  body children — Heading styles → ``#`` prefixes, tables → Markdown,
  embedded drawings → ``![文档图片N](embedded:...)`` placeholders
  (the reference uploads blobs and substitutes URLs; no uploader
  exists here, so placeholders keep positions faithful).
- XLSX (ref :914-941): workbook→rels→sheet traversal with
  sharedStrings resolution, per-sheet ``### 工作表: name`` sections,
  500-row cap with the reference's ``共 N 行，已截断`` marker row.
- PPTX (ref :841-911): per-slide ``## 幻灯片 N[: title]`` sections,
  shapes sorted by top offset, text frames / tables / picture
  placeholders, slides joined by ``---`` rules.

PDF (ref :667-762) genuinely needs a PDF engine: the body below is
the reference's algorithm (pdfplumber table bboxes dedup'd out of
fitz y-sorted text blocks, 50-page cap) written against ``fitz`` and
``pdfplumber`` behind ImportError guards — when the libraries exist
the parse RUNS; only when absent does it fall back to the
deterministic stub payload.

Images (ref :1029-1050): header-sniffed dimensions (PNG/GIF/JPEG/BMP
— stdlib struct reads, no PIL needed) plus an OCR section when
PIL+pytesseract are importable.

All parsers are bytes → Markdown str, called from the Arrow-batched
``mapInPandas`` in ``sources.documents`` — per-partition Python,
never per-row UDFs, no shuffle.
"""

from __future__ import annotations

import io
import re
import struct
import zipfile
from xml.etree import ElementTree as ET

PDF_MAX_PAGES = 50     # 多数据源获取数据.py:614
MAX_TABLE_ROWS = 500   # 多数据源获取数据.py:615
MIN_IMG_BYTES = 5 * 1024   # :618
MIN_IMG_DIM = 50           # :619


def _iter_local(el: ET.Element, name: str):
    """iter() by local name — ET's iter() lacks the {*} wildcard that
    find/findall support."""
    for e in el.iter():
        if e.tag.rsplit("}", 1)[-1] == name:
            yield e


def rows_to_md_table(rows: list[list[str]]) -> str:
    """Pad-to-width Markdown table (reference _rows_to_md_table)."""
    if not rows:
        return ""
    max_cols = max(len(r) for r in rows)
    padded = [list(r) + [""] * (max_cols - len(r)) for r in rows]

    def cell(c: object) -> str:
        return str(c).replace("|", "\\|").replace("\n", " ")[:80]

    header = "| " + " | ".join(cell(c) for c in padded[0]) + " |"
    sep = "| " + " | ".join("---" for _ in padded[0]) + " |"
    body = ["| " + " | ".join(cell(c) for c in row) + " |" for row in padded[1:]]
    return "\n".join([header, sep] + body)


# --- DOCX (stdlib zip+XML) --------------------------------------------------


def _para_text(p: ET.Element) -> str:
    return "".join(t.text or "" for t in _iter_local(p, "t"))


_HEADING_RE = re.compile(r"(?i)heading\s*(\d)")


def parse_docx_bytes(data: bytes) -> str:
    """word/document.xml body walk in document order (ref :765-838:
    headings→#, tables→MD, drawings→image placeholders)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        xml = zf.read("word/document.xml")
    root = ET.fromstring(xml)
    body = root.find("{*}body")
    if body is None:
        return ""
    parts: list[str] = []
    img_count = 0
    for el in body:
        tag = el.tag.rsplit("}", 1)[-1]
        if tag == "p":
            text = _para_text(el).strip()
            if text:
                style = el.find("{*}pPr/{*}pStyle")
                level = None
                if style is not None:
                    val = next((v for k, v in style.attrib.items() if k.endswith("}val")), "")
                    m = _HEADING_RE.match(val)
                    if m:
                        level = int(m.group(1))
                    elif val.isdigit():
                        level = int(val)
                if level:
                    parts.append("#" * level + " " + text)
                else:
                    parts.append(text)
            if next(_iter_local(el, "drawing"), None) is not None or next(
                _iter_local(el, "imagedata"), None
            ) is not None:
                img_count += 1
                parts.append(f"![文档图片{img_count}](embedded:image{img_count})")
        elif tag == "tbl":
            rows = []
            for tr in el.findall("{*}tr"):
                rows.append(["\n".join(_para_text(p) for p in tc.findall(".//{*}p")).strip()
                             for tc in tr.findall("{*}tc")])
            if rows:
                parts.append(rows_to_md_table(rows))
    return "\n\n".join(parts)


# --- XLSX (stdlib zip+XML) --------------------------------------------------


_CELL_REF_RE = re.compile(r"^([A-Z]+)\d+$")


def _col_index(ref: str) -> int | None:
    m = _CELL_REF_RE.match(ref or "")
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return ["".join(t.text or "" for t in _iter_local(si, "t")) for si in root.findall("{*}si")]


def parse_xlsx_bytes(data: bytes) -> str:
    """Sheet-by-sheet Markdown tables, 500-row cap with the
    reference's truncation marker (ref :914-941)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target") for r in rels.findall("{*}Relationship")
        }
        shared = _shared_strings(zf)
        parts: list[str] = []
        for sheet in wb.findall("{*}sheets/{*}sheet"):
            name = sheet.get("name", "")
            rid = next((v for k, v in sheet.attrib.items() if k.endswith("}id")), None)
            target = rid_to_target.get(rid) or ""
            if not target:
                continue
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            ws = ET.fromstring(zf.read(target))
            row_els = ws.findall("{*}sheetData/{*}row")
            rows: list[list[str]] = []
            for ri, row in enumerate(row_els):
                if ri >= MAX_TABLE_ROWS:
                    rows.append(["...", f"共 {len(row_els)} 行，已截断", "..."])
                    break
                cells: list[str] = []
                for c in row.findall("{*}c"):
                    ci = _col_index(c.get("r", ""))
                    if ci is None:
                        ci = len(cells)
                    while len(cells) < ci:
                        cells.append("")
                    ctype = c.get("t", "n")
                    v = c.find("{*}v")
                    if ctype == "s" and v is not None and v.text is not None:
                        val = shared[int(v.text)] if int(v.text) < len(shared) else ""
                    elif ctype == "inlineStr":
                        val = "".join(t.text or "" for t in _iter_local(c, "t"))
                    elif ctype == "b" and v is not None:
                        val = "True" if v.text == "1" else "False"
                    else:
                        val = v.text if v is not None and v.text is not None else ""
                    cells.append(val)
                rows.append(cells)
            if rows and any(any(cell for cell in r) for r in rows):
                parts.append(f"### 工作表: {name}\n\n{rows_to_md_table(rows)}")
    return "\n\n".join(parts)


# --- PPTX (stdlib zip+XML) --------------------------------------------------


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def _shape_top(el: ET.Element) -> int:
    off = el.find(".//{*}off")
    if off is not None:
        try:
            return int(off.get("y", "0"))
        except ValueError:
            return 0
    return 0


def parse_pptx_bytes(data: bytes) -> str:
    """Per-slide sections, shapes sorted by top offset (ref :841-911)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        slides = sorted(
            (int(m.group(1)), n)
            for n in zf.namelist()
            if (m := _SLIDE_RE.match(n))
        )
        parts: list[str] = []
        img_count = 0
        for si, name in slides:
            root = ET.fromstring(zf.read(name))
            tree = root.find(".//{*}spTree")
            if tree is None:
                continue
            slide_title = ""
            elements: list[tuple[int, str]] = []
            for el in tree:
                tag = el.tag.rsplit("}", 1)[-1]
                top = _shape_top(el)
                if tag == "sp":
                    paras = [
                        "".join(t.text or "" for t in _iter_local(p, "t")).strip()
                        for p in el.findall(".//{*}txBody/{*}p")
                    ]
                    text = "\n".join(p for p in paras if p)
                    if text:
                        ph = el.find(".//{*}ph")
                        is_title = ph is not None and (
                            ph.get("type") in ("title", "ctrTitle") or ph.get("idx") == "0"
                        )
                        if is_title and not slide_title:
                            slide_title = text.replace("\n", " ")
                        else:
                            elements.append((top, text))
                elif tag == "pic":
                    img_count += 1
                    elements.append(
                        (top, f"![幻灯片{si}-图片{img_count}](embedded:slide{si}_image{img_count})")
                    )
                elif tag == "graphicFrame":
                    tbl = el.find(".//{*}tbl")
                    if tbl is not None:
                        rows = [
                            ["\n".join(
                                "".join(t.text or "" for t in _iter_local(p, "t"))
                                for p in tc.findall(".//{*}p")
                            ).strip() for tc in tr.findall("{*}tc")]
                            for tr in tbl.findall("{*}tr")
                        ]
                        if rows:
                            elements.append((top, rows_to_md_table(rows)))
            elements.sort(key=lambda x: x[0])
            header = f"## 幻灯片 {si}"
            if slide_title:
                header += f": {slide_title}"
            body = "\n\n".join(e[1] for e in elements)
            if body.strip() or slide_title:
                parts.append(f"{header}\n\n{body}".rstrip())
    return "\n\n---\n\n".join(parts)


# --- image metadata + OCR ---------------------------------------------------


def sniff_image_dims(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from file headers — stdlib only."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "PNG", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "GIF", w, h
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return "BMP", w, abs(h)
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5 : i + 9])
                return "JPEG", w, h
            seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
            i += 2 + seg_len
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        if data[12:16] == b"VP8L" and len(data) >= 25 and data[20] == 0x2F:
            # VP8L: 14-bit w-1 / h-1 bit-packed after the signature byte
            b0, b1, b2, b3 = data[21:25]
            w = 1 + (b0 | ((b1 & 0x3F) << 8))
            h = 1 + ((b1 >> 6) | (b2 << 2) | ((b3 & 0x0F) << 10))
            return "WEBP", w, h
        if data[12:16] == b"VP8 " and len(data) >= 30 and data[23:26] == b"\x9d\x01\x2a":
            # lossy VP8 keyframe: start code then 14-bit LE dimensions
            w = struct.unpack("<H", data[26:28])[0] & 0x3FFF
            h = struct.unpack("<H", data[28:30])[0] & 0x3FFF
            return "WEBP", w, h
    return None


def parse_image_bytes(data: bytes) -> str:
    """Image info + OCR, tiered (ref :1029-1050): PIL dims where PIL
    exists, else the stdlib header sniff; pytesseract OCR where the
    full stack exists, else the vendored bitmap-font matchers
    (sources/bitmapfont.py): the strict binary grid decoder first,
    then the anti-aliased correlation tier (Otsu threshold +
    fractional pitch + normalized cross-correlation — reads rescaled/
    smoothed renderings of the vendored font). Both are conservative,
    so only machine-rendered text produces an OCR section on the
    library-free tier; photographs stay dims-only."""
    parts: list[str] = []
    ocr_text = ""
    try:
        from PIL import Image as PILImage  # noqa: PLC0415

        img = PILImage.open(io.BytesIO(data))
        w, h = img.size
        parts.append(f"**图片信息**: {img.format or 'Unknown'}, {w}x{h}px, {img.mode}")
        try:
            import pytesseract  # noqa: PLC0415

            try:
                ocr_text = pytesseract.image_to_string(img, lang="chi_sim+eng")
            except Exception:  # noqa: BLE001 — chi_sim pack absent:
                # degrade to the default (eng) pack rather than losing
                # OCR entirely on an english-only tesseract install
                ocr_text = pytesseract.image_to_string(img)
        except Exception:  # noqa: BLE001  (missing binary, bad lang pack…)
            pass
    except ImportError:
        dims = sniff_image_dims(data)
        if dims:
            fmt, w, h = dims
            parts.append(f"**图片信息**: {fmt}, {w}x{h}px")
    except Exception:  # noqa: BLE001
        pass
    if not (ocr_text and ocr_text.strip()):
        try:
            from data_pipeline_childcare_spark.sources.bitmapfont import (  # noqa: PLC0415
                ocr_antialiased_text,
                ocr_bitmap_text,
            )

            ocr_text = ocr_bitmap_text(data) or ocr_antialiased_text(data)
        except Exception:  # noqa: BLE001 — undecodable image
            pass
    if ocr_text and ocr_text.strip():
        parts.append(f"**OCR 识别文本**:\n\n{ocr_text.strip()}")
    if not parts:
        return f"[图片文件, {len(data)} bytes]"
    return "\n\n".join(parts)


# --- PDF (fitz/pdfplumber import-guarded real body) -------------------------


def _bbox_overlap(a, b, tolerance: float = 3.0) -> bool:
    """>50% x-overlap with y-intersection (ref :650-664)."""
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    if ax1 < bx0 + tolerance or bx1 < ax0 + tolerance:
        return False
    if ay1 < by0 + tolerance or by1 < ay0 + tolerance:
        return False
    overlap_x = min(ax1, bx1) - max(ax0, bx0)
    width_a = ax1 - ax0
    return width_a > 0 and (overlap_x / width_a) > 0.5


def parse_pdf_bytes(data: bytes) -> str:
    """Reference PDF algorithm (ref :667-762): pdfplumber table bboxes
    dedup'd out of fitz's y-sorted text blocks, image placeholders for
    large embedded images, 50-page cap. Runs whenever ``fitz`` is
    importable; pdfplumber is optional (tables skipped without it)."""
    try:
        import fitz  # noqa: PLC0415
    except ImportError:
        # no fitz: the library-free extractor handles the common
        # Flate/simple-font case (sources/pdftext.py); only when IT
        # finds nothing does the deterministic stub tier remain
        from data_pipeline_childcare_spark.sources.pdftext import (  # noqa: PLC0415
            extract_pdf_text_minimal,
        )

        text = extract_pdf_text_minimal(data, max_pages=PDF_MAX_PAGES)
        if text:
            return text
        return f"[STUB:pdf parser (fitz not installed, no extractable text) — {len(data)} bytes]"

    table_bboxes_per_page: dict[int, list] = {}
    plumber_tables_per_page: dict[int, list] = {}
    try:
        import pdfplumber  # noqa: PLC0415

        with pdfplumber.open(io.BytesIO(data)) as plumber_pdf:
            for pi in range(min(len(plumber_pdf.pages), PDF_MAX_PAGES)):
                pp = plumber_pdf.pages[pi]
                page_tables, page_bboxes = [], []
                for tbl in pp.find_tables():
                    rows = tbl.extract()
                    if not rows:
                        continue
                    cleaned = [[(c or "").strip() for c in row] for row in rows]
                    if any(any(cell for cell in r) for r in cleaned):
                        page_tables.append((tbl.bbox[1], cleaned))
                        page_bboxes.append(tbl.bbox)
                if page_tables:
                    plumber_tables_per_page[pi] = page_tables
                    table_bboxes_per_page[pi] = page_bboxes
    except Exception:  # noqa: BLE001  (pdfplumber absent or failed: text-only)
        pass

    parts: list[str] = []
    img_count = 0
    with fitz.open(stream=data, filetype="pdf") as doc:
        total = len(doc)
        limit = min(total, PDF_MAX_PAGES)
        for pi in range(limit):
            page = doc.load_page(pi)
            page_dict = page.get_text("dict", sort=True)
            tbl_bboxes = table_bboxes_per_page.get(pi, [])
            elements: list[tuple[float, str]] = []
            for block in page_dict.get("blocks", []):
                b_bbox = block.get("bbox", [0, 0, 0, 0])
                y0 = b_bbox[1]
                if block["type"] == 0:
                    if tbl_bboxes and any(_bbox_overlap(b_bbox, tb) for tb in tbl_bboxes):
                        continue
                    lines = [
                        "".join(s.get("text", "") for s in ln.get("spans", [])).strip()
                        for ln in block.get("lines", [])
                    ]
                    text = "\n".join(ln for ln in lines if ln)
                    if text:
                        elements.append((y0, text))
                elif block["type"] == 1:
                    w, h = b_bbox[2] - b_bbox[0], b_bbox[3] - b_bbox[1]
                    if w < MIN_IMG_DIM or h < MIN_IMG_DIM:
                        continue
                    if len(block.get("image", b"")) < MIN_IMG_BYTES:
                        continue
                    img_count += 1
                    elements.append(
                        (y0, f"![图片{img_count} (第{pi + 1}页, {int(w)}x{int(h)})](pdf_image_{img_count})")
                    )
            for tbl_y0, tbl_rows in plumber_tables_per_page.get(pi, []):
                elements.append((tbl_y0, rows_to_md_table(tbl_rows)))
            elements.sort(key=lambda x: x[0])
            page_content = "\n\n".join(e[1] for e in elements)
            if page_content.strip():
                parts.append(
                    f"<!-- 第 {pi + 1} 页 -->\n\n{page_content}" if limit > 1 else page_content
                )
        if total > PDF_MAX_PAGES:
            parts.append(f"> PDF 共 {total} 页，已处理前 {limit} 页")
    return "\n\n".join(parts).strip()
