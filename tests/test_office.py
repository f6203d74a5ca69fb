"""Office parser bodies (S7-S10, S14) on hand-crafted files — the
OOXML parsers are stdlib zip+XML, so they run for real in this
container; PDF asserts the guarded-stub path (no fitz here)."""

from __future__ import annotations

import io
import struct
import zipfile

import pytest

from data_pipeline_childcare_spark.sources.office import (
    MAX_TABLE_ROWS,
    parse_docx_bytes,
    parse_image_bytes,
    parse_pdf_bytes,
    parse_pptx_bytes,
    parse_xlsx_bytes,
    rows_to_md_table,
    sniff_image_dims,
)

W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def make_docx(document_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", document_xml)
    return buf.getvalue()


def make_xlsx(sheets: dict[str, str], shared: list[str] | None = None) -> bytes:
    buf = io.BytesIO()
    names = list(sheets)
    with zipfile.ZipFile(buf, "w") as zf:
        sheet_els = "".join(
            f'<sheet name="{n}" sheetId="{i+1}" r:id="rId{i+1}"/>' for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_els}</sheets></workbook>",
        )
        rel_els = "".join(
            f'<Relationship Id="rId{i+1}" Type="t" Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rel_els}</Relationships>",
        )
        if shared:
            si = "".join(f"<si><t>{s}</t></si>" for s in shared)
            zf.writestr(
                "xl/sharedStrings.xml",
                '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"{si}</sst>",
            )
        for i, n in enumerate(names):
            zf.writestr(
                f"xl/worksheets/sheet{i+1}.xml",
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{sheets[n]}</sheetData></worksheet>",
            )
    return buf.getvalue()


P_NS = (
    'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"'
)


def make_pptx(slides: list[str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        for i, body in enumerate(slides):
            zf.writestr(
                f"ppt/slides/slide{i+1}.xml",
                f"<p:sld {P_NS}><p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()


def test_docx_headings_tables_images_document_order():
    doc = f"""<w:document {W_NS}><w:body>
      <w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>第一章</w:t></w:r></w:p>
      <w:p><w:r><w:t>托育机构</w:t></w:r><w:r><w:t>建设情况。</w:t></w:r></w:p>
      <w:p><w:r><w:drawing/></w:r></w:p>
      <w:tbl>
        <w:tr><w:tc><w:p><w:r><w:t>城市</w:t></w:r></w:p></w:tc>
              <w:tc><w:p><w:r><w:t>数量</w:t></w:r></w:p></w:tc></w:tr>
        <w:tr><w:tc><w:p><w:r><w:t>成都</w:t></w:r></w:p></w:tc>
              <w:tc><w:p><w:r><w:t>12</w:t></w:r></w:p></w:tc></w:tr>
      </w:tbl>
      <w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>小节</w:t></w:r></w:p>
    </w:body></w:document>"""
    md = parse_docx_bytes(make_docx(doc))
    blocks = md.split("\n\n")
    assert blocks[0] == "# 第一章"
    assert blocks[1] == "托育机构建设情况。"  # runs concatenated
    assert blocks[2] == "![文档图片1](embedded:image1)"
    assert blocks[3].startswith("| 城市 | 数量 |")
    assert "| 成都 | 12 |" in blocks[3]
    assert blocks[4] == "## 小节"  # table appears BETWEEN paragraphs (document order)


def test_docx_pipe_and_newline_escaping_in_cells():
    doc = f"""<w:document {W_NS}><w:body><w:tbl>
      <w:tr><w:tc><w:p><w:r><w:t>a|b</w:t></w:r></w:p>
                  <w:p><w:r><w:t>第二段</w:t></w:r></w:p></w:tc></w:tr>
    </w:tbl></w:body></w:document>"""
    md = parse_docx_bytes(make_docx(doc))
    assert "a\\|b 第二段" in md  # | escaped, intra-cell newline → space


def test_xlsx_shared_strings_column_gaps_and_multiple_sheets():
    s1 = (
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="C2"><v>42</v></c></row>'
    )
    s2 = '<row r="1"><c r="A1" t="b"><v>1</v></c><c r="B1" t="inlineStr"><is><t>行内</t></is></c></row>'
    md = parse_xlsx_bytes(make_xlsx({"数据": s1, "杂项": s2}, shared=["名称", "值", "东西"]))
    assert "### 工作表: 数据" in md and "### 工作表: 杂项" in md
    assert "| 名称 | 值 |" in md
    assert "| 东西 |  | 42 |" in md  # B2 missing → padded empty cell
    assert "| True | 行内 |" in md


def test_xlsx_row_cap_truncation_marker():
    rows = "".join(
        f'<row r="{i+1}"><c r="A{i+1}"><v>{i}</v></c></row>' for i in range(MAX_TABLE_ROWS + 2)
    )
    md = parse_xlsx_bytes(make_xlsx({"big": rows}))
    assert f"共 {MAX_TABLE_ROWS + 2} 行，已截断" in md
    assert md.count("\n") < MAX_TABLE_ROWS + 20  # capped, not 502 rows


def test_pptx_title_order_tables_pictures():
    slide1 = """
      <p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr></p:nvSpPr>
        <p:spPr><a:xfrm><a:off x="0" y="0"/></a:xfrm></p:spPr>
        <p:txBody><a:p><a:r><a:t>调研封面</a:t></a:r></a:p></p:txBody></p:sp>
      <p:sp><p:spPr><a:xfrm><a:off x="0" y="9000"/></a:xfrm></p:spPr>
        <p:txBody><a:p><a:r><a:t>下方文本</a:t></a:r></a:p></p:txBody></p:sp>
      <p:sp><p:spPr><a:xfrm><a:off x="0" y="3000"/></a:xfrm></p:spPr>
        <p:txBody><a:p><a:r><a:t>上方文本</a:t></a:r></a:p></p:txBody></p:sp>
      <p:pic><p:spPr><a:xfrm><a:off x="0" y="6000"/></a:xfrm></p:spPr></p:pic>
    """
    slide2 = """
      <p:graphicFrame><p:xfrm><a:off x="0" y="100"/></p:xfrm>
        <a:graphic><a:graphicData><a:tbl>
          <a:tr><a:tc><a:txBody><a:p><a:r><a:t>h</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
          <a:tr><a:tc><a:txBody><a:p><a:r><a:t>v</a:t></a:r></a:p></a:txBody></a:tc></a:tr>
        </a:tbl></a:graphicData></a:graphic></p:graphicFrame>
    """
    md = parse_pptx_bytes(make_pptx([slide1, slide2]))
    s1, s2 = md.split("\n\n---\n\n")
    assert s1.startswith("## 幻灯片 1: 调研封面")
    # sorted by top offset: 上方文本 (3000) < pic (6000) < 下方文本 (9000)
    assert s1.index("上方文本") < s1.index("![幻灯片1-图片1]") < s1.index("下方文本")
    assert s2.startswith("## 幻灯片 2")
    assert "| h |" in s2 and "| v |" in s2


def test_pdf_guarded_stub_when_no_engine():
    out = parse_pdf_bytes(b"%PDF-1.4 not really")
    try:
        import fitz  # noqa: F401

        assert "STUB" not in out  # engine present → real parse attempted
    except ImportError:
        # no fitz AND the library-free extractor finds nothing → stub
        assert out == (
            "[STUB:pdf parser (fitz not installed, no extractable text) — 19 bytes]"
        )


# --- library-free PDF text extraction (sources/pdftext.py) -----------------


def _pdf_escape(raw: bytes) -> bytes:
    return raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")


def _mini_pdf(page_streams: list[bytes], compress: bool = True, reverse_kids: bool = False) -> bytes:
    """Crafted N-page PDF: catalog(1) → pages(2) → per page (page obj,
    content obj). Offsets in the xref are fake — the extractor scans
    objects, it does not need a valid xref (real-world tolerant)."""
    import zlib

    n = len(page_streams)
    objs: list[bytes] = []
    kid_nums = [3 + 2 * i for i in range(n)]
    kids = b" ".join(b"%d 0 R" % k for k in (reversed(kid_nums) if reverse_kids else kid_nums))
    objs.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    objs.append(b"2 0 obj\n<< /Type /Pages /Kids [" + kids + b"] /Count %d >>\nendobj\n" % n)
    for i, cs in enumerate(page_streams):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs.append(
            b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>\nendobj\n"
            % (pnum, cnum)
        )
        payload = zlib.compress(cs) if compress else cs
        filt = b"/Filter /FlateDecode " if compress else b""
        objs.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (cnum, filt, len(payload))
            + payload
            + b"\nendstream\nendobj\n"
        )
    body = b"".join(objs)
    return (
        b"%PDF-1.4\n" + body
        + b"trailer\n<< /Size %d /Root 1 0 R >>\n%%%%EOF\n" % (len(objs) + 1)
    )


def test_pdftext_flate_stream_tj_and_tj_array():
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    cs = b"BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -14 Td [(Wor) -120 (ld)] TJ ET"
    out = extract_pdf_text_minimal(_mini_pdf([cs]))
    assert out == "Hello\nWorld"


def test_pdftext_escapes_hex_and_utf16():
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    lit = _pdf_escape("第1页(测试)".encode("utf-16-be"))
    cs = (
        b"BT (a\\(b\\)c \\\\ \\101\\102) Tj T* (\xfe\xff" + lit + b") Tj "
        b"T* <48656C6C6F> Tj ET"
    )
    out = extract_pdf_text_minimal(_mini_pdf([cs], compress=False))
    assert out.splitlines() == ["a(b)c \\ AB", "第1页(测试)", "Hello"]


def test_pdftext_multipage_follows_kids_order():
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    pages = [b"BT (page-one) Tj ET", b"BT (page-two) Tj ET"]
    out = extract_pdf_text_minimal(_mini_pdf(pages, reverse_kids=True))
    # Kids order reversed ⇒ page-two is 第 1 页
    assert out.index("page-two") < out.index("page-one")
    assert "<!-- 第 1 页 -->" in out and "<!-- 第 2 页 -->" in out


def test_pdftext_page_cap_note():
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    pages = [b"BT (p%d) Tj ET" % i for i in range(5)]
    out = extract_pdf_text_minimal(_mini_pdf(pages), max_pages=3)
    assert "p2" in out and "p3" not in out
    assert "共 5 页，已处理前 3 页" in out


def test_pdftext_corrupt_and_nonpdf_return_empty():
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    assert extract_pdf_text_minimal(b"not a pdf") == ""
    assert extract_pdf_text_minimal(b"%PDF-1.4 truncated garbage") == ""


def test_parse_pdf_bytes_routes_minimal_extractor_without_fitz():
    try:
        import fitz  # noqa: F401

        return  # fitz present: the real engine path is used instead
    except ImportError:
        pass
    out = parse_pdf_bytes(_mini_pdf([b"BT (real text now) Tj ET"]))
    assert out == "real text now"


def test_image_dims_stdlib_sniff():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34)
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 480, 640)
    )
    assert sniff_image_dims(png) == ("PNG", 640, 480)
    assert sniff_image_dims(gif) == ("GIF", 12, 34)
    assert sniff_image_dims(jpeg) == ("JPEG", 640, 480)
    # VP8L: bit-packed 14-bit dims after the 0x2F signature
    dims = (799, 601)
    packed = (dims[0] - 1) | ((dims[1] - 1) << 14)
    vp8l = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8L"
        + struct.pack("<I", 10) + bytes([0x2F])
        + bytes((packed >> (8 * i)) & 0xFF for i in range(4)) + bytes(5)
    )
    assert sniff_image_dims(vp8l) == ("WEBP", 799, 601)
    # lossy VP8 keyframe: start code 9d 01 2a then 14-bit LE dims
    vp8 = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 12) + bytes(3) + b"\x9d\x01\x2a"
        + struct.pack("<HH", 320, 240) + bytes(4)
    )
    assert sniff_image_dims(vp8) == ("WEBP", 320, 240)
    assert sniff_image_dims(b"not an image") is None
    out = parse_image_bytes(png)
    assert "640x480px" in out
    assert parse_image_bytes(b"junk") == "[图片文件, 4 bytes]"


def _ocr_stack_available() -> bool:
    try:
        import pytesseract  # noqa: PLC0415
        from PIL import Image, ImageDraw  # noqa: F401, PLC0415

        pytesseract.get_tesseract_version()
        return True
    except Exception:  # noqa: BLE001  (lib or binary missing)
        return False


def test_parse_image_bytes_ocr_golden_vendored():
    """ALWAYS-RUN golden OCR round-trip on the vendored dot-matrix
    tier (sources/bitmapfont.py): render known text through the
    in-repo PNG encoder, feed the bytes to parse_image_bytes, and
    require the OCR section to carry the words back out — no PIL, no
    pytesseract. The pytesseract tier keeps its own env-gated golden
    test below."""
    from data_pipeline_childcare_spark.sources.bitmapfont import render_text_png

    png = render_text_png("HELLO SPARK 2026", scale=3, margin=6)
    out = parse_image_bytes(png)
    assert "**图片信息**" in out and "PNG" in out
    assert "OCR 识别文本" in out, f"no OCR section in: {out!r}"
    assert "HELLO SPARK 2026" in out


def test_bitmapfont_roundtrip_and_conservative_gate():
    """The vendored matcher: exact round-trip across scales/margins,
    full alphabet, punctuation, multi-space; noise and non-images
    return '' (never garbage)."""
    import hashlib

    from data_pipeline_childcare_spark.sources.bitmapfont import (
        ocr_bitmap_text,
        render_text_png,
    )
    from data_pipeline_childcare_spark.sources.imagecodec import encode_png

    for txt, sc, mg in [
        ("ABCDEFGHIJKLM", 1, 2),
        ("NOPQRSTUVWXYZ", 2, 3),
        ("0123456789", 4, 10),
        ("TEST-1.5: OK", 3, 7),
        ("IJI JIJ", 2, 4),
    ]:
        assert ocr_bitmap_text(render_text_png(txt, scale=sc, margin=mg)) == txt
    noise = bytes(
        hashlib.md5(bytes([i % 251])).digest()[0] for i in range(64 * 64)
    )
    assert ocr_bitmap_text(encode_png(64, 64, noise, mode="L")) == ""
    assert ocr_bitmap_text(b"not an image at all") == ""


def test_antialiased_ocr_golden_rendered_sample():
    """ALWAYS-RUN golden test for the anti-aliased OCR tier (round-6
    verdict #8): render dot-matrix text, box-filter it down to a
    NON-INTEGER scale (0.55-0.75×) so every glyph edge is genuine
    gray, shift brightness — the strict binary matcher refuses such
    images — and require the correlation tier to read the text back.
    Natural noise and smooth gradients must still return ''."""
    import random

    from data_pipeline_childcare_spark.sources.bitmapfont import (
        _area_mean,
        ocr_antialiased_text,
        ocr_bitmap_text,
        render_text_gray,
    )
    from data_pipeline_childcare_spark.sources.imagecodec import encode_png

    def shrink(w, h, gray, factor, bright):
        nw, nh = int(w * factor), int(h * factor)
        out = bytearray()
        for ny in range(nh):
            for nx in range(nw):
                v = _area_mean(
                    gray, w, nx / factor, (nx + 1) / factor,
                    ny / factor, (ny + 1) / factor,
                )
                out.append(max(0, min(255, int(v) + bright)))
        return nw, nh, bytes(out)

    for text, factor, bright in [
        ("HELLO WORLD", 0.6, -30),
        ("SPARK 4.1", 0.75, 25),
        ("REG-2024 NO:17", 0.55, 0),
    ]:
        w, h, g = render_text_gray(text, scale=3, margin=5)
        nw, nh, ng = shrink(w, h, g, factor, bright)
        png = encode_png(nw, nh, ng, mode="L")
        # the strict integer-grid tier cannot read it...
        assert ocr_bitmap_text(png) == ""
        # ...the anti-aliased tier can, and the parse dispatcher
        # (office.parse_image_bytes) reaches it through the tiering
        assert ocr_antialiased_text(png) == text
        out = parse_image_bytes(png)
        assert text in out and "OCR 识别文本" in out

    rnd = random.Random(7)
    noise = bytes(rnd.randrange(256) for _ in range(64 * 64))
    assert ocr_antialiased_text(encode_png(64, 64, noise, mode="L")) == ""
    grad = bytes((x * 255) // 63 for _y in range(64) for x in range(64))
    assert ocr_antialiased_text(encode_png(64, 64, grad, mode="L")) == ""
    assert ocr_antialiased_text(b"not an image") == ""


@pytest.mark.skipif(
    not _ocr_stack_available(),
    reason="S14 pytesseract OCR tier needs PIL + pytesseract + the tesseract "
    "binary (env-gated: runs automatically wherever the stack exists; the "
    "vendored dot-matrix tier above runs everywhere)",
)
def test_parse_image_bytes_ocr_golden():
    """Golden scanned-image fixture: render known text with PIL's
    built-in font, round-trip through parse_image_bytes, and require
    the OCR section to carry the words back out (reference
    多数据源获取数据.py:1029-1050). Skipped where the OCR stack is
    absent — there parse_image_bytes' documented contract is the
    dims-only metadata line (pinned by
    test_image_dims_stdlib_sniff)."""
    import io as _io

    from PIL import Image, ImageDraw, ImageFont

    try:
        font = ImageFont.load_default(48)  # scalable embedded font (PIL>=10.1)
        img = Image.new("L", (700, 160), 255)
        ImageDraw.Draw(img).text((30, 40), "HELLO SPARK 2026", fill=0, font=font)
    except TypeError:  # older PIL: tiny bitmap font — upscale for OCR
        img = Image.new("L", (200, 40), 255)
        ImageDraw.Draw(img).text((10, 12), "HELLO SPARK 2026", fill=0)
        img = img.resize((800, 160), Image.NEAREST)
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    out = parse_image_bytes(buf.getvalue())
    assert "**图片信息**: PNG" in out
    assert "OCR 识别文本" in out, f"no OCR section in: {out!r}"
    up = out.upper()
    assert "HELLO" in up and "SPARK" in up


def test_rows_to_md_table_pads_ragged_rows():
    md = rows_to_md_table([["a"], ["b", "c", "d"]])
    assert md.splitlines()[0] == "| a |  |  |"
    assert md.splitlines()[2] == "| b | c | d |"


def test_parse_documents_dispatches_office_formats(spark):
    """End-to-end through the Arrow-batched mapInPandas dispatch."""
    from data_pipeline_childcare_spark.sources.documents import parse_documents

    docx = make_docx(
        f'<w:document {W_NS}><w:body><w:p><w:r><w:t>文档正文</w:t></w:r></w:p></w:body></w:document>'
    )
    xlsx = make_xlsx({"s": '<row r="1"><c r="A1"><v>7</v></c></row>'})
    rows = [
        ("a.docx", "docx", bytearray(docx)),
        ("b.xlsx", "xlsx", bytearray(xlsx)),
        ("c.png", "image", bytearray(b"\x89PNG\r\n\x1a\n\x00\x00\x00\rIHDR" + struct.pack(">II", 2, 3))),
    ]
    df = spark.createDataFrame(rows, "path string, fmt string, content binary")
    got = {r["path"]: r for r in parse_documents(df).collect()}
    assert got["a.docx"]["error"] is None and got["a.docx"]["content"] == "文档正文"
    assert "| 7 |" in got["b.xlsx"]["content"]
    assert "2x3px" in got["c.png"]["content"]


def test_pdftext_flate_payload_ending_in_whitespace_byte():
    """zlib output routinely ends in whitespace-class bytes; the
    extractor must honor /Length instead of letting the EOL-before-
    endstream match absorb the payload's last byte (which corrupts the
    stream and silently drops the page)."""
    import zlib as _z

    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    import hashlib as _h

    for i in range(2000):
        tag = _h.md5(b"pdfws%d" % i).hexdigest()[:12]
        text = b"BT (case " + tag.encode() + b") Tj ET"
        cs = _z.compress(text)
        if cs[-1:] in b" \t\r\n\x0b\x0c":
            out = extract_pdf_text_minimal(_mini_pdf([text]))
            assert out == f"case {tag}"
            return
    raise AssertionError("no whitespace-tailed compressed payload in 2000 tries")


def test_pdftext_quote_operators_break_lines():
    """' and " both move to the next line before showing (PDF 32000-1
    §9.4.3) — adjacent lines must not concatenate."""
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    cs = b"BT (line1) Tj (line2) ' 1 2 (line3) \" ET"
    out = extract_pdf_text_minimal(_mini_pdf([cs], compress=False))
    assert out.splitlines() == ["line1", "line2", "line3"]


def test_pdftext_cap_note_not_returned_alone():
    """An over-cap PDF with NO extractable text must return '' so the
    caller's stub tier engages, not just the page-cap note."""
    from data_pipeline_childcare_spark.sources.pdftext import extract_pdf_text_minimal

    # 5 pages of image-only (no text operator) streams, cap at 3
    pages = [b"q 1 0 0 1 0 0 cm Q" for _ in range(5)]
    assert extract_pdf_text_minimal(_mini_pdf(pages), max_pages=3) == ""
