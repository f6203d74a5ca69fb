"""Library-free PDF text extraction (the de-stubbed S7 fallback).

The reference parses PDFs with fitz/pdfplumber (多数据源获取数据.py:667-762);
``office.parse_pdf_bytes`` keeps that full algorithm when ``fitz`` is
importable. This module is the environment-independent fallback: a
minimal, stdlib-only (re + zlib) extractor for the by-far-most-common
PDF shape — Flate-compressed (or raw) content streams with simple-font
text operators.

Scope (documented, deliberately bounded):
- object parsing: ``N G obj … endobj`` bodies, ``stream``/``endstream``
  payloads, ``/Length``-free tolerant scanning;
- page ordering: the ``/Root → /Pages → /Kids`` tree walked recursively
  (cycle-guarded); falls back to document order of ``/Type /Page``
  objects when the tree is broken;
- filters: FlateDecode (zlib) and unfiltered streams; other filters
  (DCT, LZW, ASCII85…) are skipped;
- text operators: BT/ET blocks with ``Tj``, ``'``, ``"`` and ``TJ``
  shows; ``Td``/``TD``/``T*`` treated as line breaks; literal strings
  with the full escape set (\\n, \\(, \\\\, octal), nested parens, and
  hex strings; UTF-16BE strings (BOM-prefixed, the ToUnicode
  convention) decoded properly, everything else as Latin-1;
- CID/Type0 composite fonts with CMap-encoded bytes are OUT of scope
  (they need the font's ToUnicode table); such shows usually decode to
  empty/unprintable and are dropped.

The page cap and page-marker format mirror the fitz path so downstream
cleaning (P10-P12) sees the same shape either way.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)\bendobj", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_CONTENTS_REF_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[([^\]]*)\]", re.S)
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_ROOT_REF_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj number → (dict/head bytes, raw stream payload or None)."""
    objects: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(data):
        num, body = int(m.group(1)), m.group(2)
        sm = _STREAM_START_RE.search(body)
        if not sm:
            objects[num] = (body, None)
            continue
        head, rest = body[: sm.start()], body[sm.end():]
        payload = None
        # /Length is authoritative when it lines up with an endstream
        # marker — a trailing-whitespace payload byte must NOT be
        # absorbed by the EOL before 'endstream' (zlib data routinely
        # ends in whitespace-class bytes)
        lm = _LENGTH_RE.search(head)
        if lm:
            ln = int(lm.group(1))
            if len(rest) >= ln and re.match(rb"\s*endstream", rest[ln:]):
                payload = rest[:ln]
        if payload is None:
            em = rest.rfind(b"endstream")
            if em != -1:
                payload = re.sub(rb"\r?\n\Z", b"", rest[:em])
        objects[num] = (head, payload)
    return objects


def _page_order(objects: dict[int, tuple[bytes, bytes | None]], data: bytes) -> list[int]:
    """Page object numbers in /Kids tree order; document order fallback."""
    roots: list[int] = []
    rm = _ROOT_REF_RE.search(data)
    if rm and int(rm.group(1)) in objects:
        pm = _PAGES_REF_RE.search(objects[int(rm.group(1))][0])
        if pm:
            roots.append(int(pm.group(1)))
    if not roots:
        roots = [
            n for n, (head, _) in objects.items()
            if re.search(rb"/Type\s*/Pages\b", head) and not _PAGE_TYPE_RE.search(head)
        ]

    ordered: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen or num not in objects:
            return
        seen.add(num)
        head = objects[num][0]
        if _PAGE_TYPE_RE.search(head):
            ordered.append(num)
            return
        km = _KIDS_RE.search(head)
        if km:
            for ref in _REF_RE.finditer(km.group(1)):
                walk(int(ref.group(1)))

    for r in roots:
        walk(r)
    if not ordered:
        ordered = [n for n, (head, _) in objects.items() if _PAGE_TYPE_RE.search(head)]
    return ordered


def _content_bytes(page_head: bytes, objects: dict[int, tuple[bytes, bytes | None]]) -> bytes:
    """Concatenated decoded content streams for one page."""
    refs: list[int] = []
    am = _CONTENTS_ARR_RE.search(page_head)
    if am:
        refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
    else:
        cm = _CONTENTS_REF_RE.search(page_head)
        if cm:
            refs = [int(cm.group(1))]
    out = b""
    for ref in refs:
        if ref not in objects:
            continue
        head, payload = objects[ref]
        if payload is None:
            continue
        if re.search(rb"/Filter\b", head):
            if re.search(rb"/FlateDecode\b", head):
                try:
                    out += zlib.decompress(payload) + b"\n"
                except zlib.error:
                    continue
            # other filters: out of scope, skip this stream
        else:
            out += payload + b"\n"
    return out


def _read_literal(cs: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ( … ) literal starting at ``i`` (the open paren)."""
    out, depth, i = bytearray(), 1, i + 1
    n = len(cs)
    while i < n and depth:
        c = cs[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = cs[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and 0x30 <= cs[j] <= 0x37:
                    oct_digits += bytes([cs[j]])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and cs[i] == 0x0A:
                    i += 1
            else:
                out.append(nxt)
                i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        if depth:
            out.append(c)
        i += 1
    return bytes(out), i


def _decode_pdf_string(raw: bytes) -> str:
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be", errors="ignore")
        except Exception:  # noqa: BLE001
            return ""
    return raw.decode("latin-1", errors="ignore")


_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_to_text(cs: bytes) -> str:
    """Fold text-show operators into lines (see module scope notes)."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []  # strings seen since the last operator
    in_text = False
    i, n = 0, len(cs)

    def breakline() -> None:
        if cur:
            lines.append("".join(cur).strip())
            cur.clear()

    while i < n:
        c = cs[i]
        if c == 0x28:  # (
            raw, i = _read_literal(cs, i)
            pending.append(_decode_pdf_string(raw))
            continue
        if c == 0x3C and i + 1 < n and cs[i + 1] != 0x3C:  # <hex>
            j = cs.find(b">", i)
            if j == -1:
                break
            hexs = re.sub(rb"\s+", b"", cs[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                pending.append(_decode_pdf_string(bytes.fromhex(hexs.decode("ascii"))))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == 0x25:  # % comment to EOL
            j = cs.find(b"\n", i)
            i = n if j == -1 else j + 1
            continue
        m = _OP_RE.match(cs, i)
        if m:
            op = m.group(0)
            if op == b"BT":
                in_text = True
                pending.clear()
            elif op == b"ET":
                breakline()
                in_text = False
                pending.clear()
            elif in_text:
                if op in (b"Tj", b"TJ"):
                    cur.extend(pending)
                    pending.clear()
                elif op in (b"'", b"\""):
                    # both quote operators move to the NEXT line before
                    # showing (PDF 32000-1 §9.4.3); " just adds spacing
                    breakline()
                    cur.extend(pending)
                    pending.clear()
                elif op in (b"Td", b"TD", b"T*", b"Tm"):
                    breakline()
                    pending.clear()
                else:
                    pending.clear()
            else:
                pending.clear()
            i = m.end()
            continue
        i += 1
    breakline()
    text = "\n".join(ln for ln in lines if ln)
    # drop control chars a broken CMap decode leaves behind
    return re.sub(r"[\x00-\x08\x0b-\x1f\x7f]", "", text).strip()


def extract_pdf_text_minimal(data: bytes, max_pages: int = 50) -> str:
    """Best-effort text from a PDF without any external library.

    Returns "" when nothing extractable (encrypted, image-only,
    non-Flate filters, exotic structure) — callers fall back to their
    stub/placeholder tier. Page markers and the page cap mirror
    ``office.parse_pdf_bytes``'s fitz path.
    """
    if not data.startswith(b"%PDF"):
        return ""
    try:
        objects = _parse_objects(data)
        pages = _page_order(objects, data)
        total = len(pages)
        limit = min(total, max_pages)
        parts: list[str] = []
        for pi in range(limit):
            head, _ = objects[pages[pi]]
            text = _content_to_text(_content_bytes(head, objects))
            if text:
                parts.append(
                    f"<!-- 第 {pi + 1} 页 -->\n\n{text}" if limit > 1 else text
                )
        if total > max_pages and parts:
            # only annotate REAL text: a cap note alone would read as
            # extracted content and wrongly bypass the caller's stub tier
            parts.append(f"> PDF 共 {total} 页，已处理前 {limit} 页")
        return "\n\n".join(parts).strip()
    except Exception:  # noqa: BLE001  (corrupt structure → stub tier)
        return ""
