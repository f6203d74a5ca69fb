"""Library-free image codecs: PNG (zlib), GIF (LZW), baseline JPEG
(Huffman + numpy IDCT), BMP, PPM.

The container has no PIL, but PNG's compression IS stdlib ``zlib``,
GIF's LZW is ~50 lines of bit twiddling, and baseline JPEG is
Huffman + an 8×8 IDCT numpy does in two matmuls — so a real decode
(true pixels, not header sniffing) needs only container parsing,
all implemented here. This turns the multimodal decode tier for
PNG/GIF/JPEG/BMP/PPM payloads into a REAL path in every environment,
deterministic across them (unlike PIL resampling, which varies by
version/filter choice).

Scope (documented, checked, errors raised otherwise):
- PNG: bit depth 8, color types 0 (gray) / 2 (RGB) / 3 (palette) /
  4 (gray+alpha) / 6 (RGBA), interlace 0, all five scanline filters
  (None/Sub/Up/Average/Paeth). Covers what the encoder here and the
  overwhelming majority of real-world 8-bit PNGs emit.
- GIF: 87a/89a first frame, global/local color tables, interlace,
  sub-rectangle frames composited on the background color; animation
  tails and transparency blending out of scope.
- BMP: uncompressed 24-bit BI_RGB, bottom-up or top-down.
- PPM: binary P6, maxval 255.
- JPEG: baseline sequential Huffman (SOF0), 8-bit, grayscale or
  YCbCr 4:4:4 / 4:2:0, restart markers; numpy does the 8×8 IDCT.
  Progressive/arithmetic raise and fall to the next tier.

Reference parity: the reference's image handling is PIL-based
(多数据源获取数据.py:1029-1050 feeds OCR); here decode feeds the
feature/dedup path in ``sources/multimodal.py``.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(see multimodal.py) — per-row Python cost is amortized per batch, and
the unfilter loop is O(bytes) with no allocation per pixel. At real
corpus scale you would swap `decode_png` for a wheel-backed decoder
behind the same signature; the Spark-side plumbing does not change.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, height: int, rowbytes: int, bpp: int):
    """Unfilter ``height`` scanlines of ``rowbytes`` bytes starting at
    ``raw[pos]`` (each prefixed by its filter-type byte). PNG filters
    operate on BYTES at ``bpp`` (bytes per pixel, ≥1) offsets
    regardless of bit depth, which is what makes one unfilter serve
    every depth. Returns (bytes, next_pos)."""
    out = bytearray(rowbytes * height)
    prev_start = -1
    for y in range(height):
        if pos >= len(raw):
            raise ValueError("PNG scanline data size mismatch")
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + rowbytes]
        if len(line) < rowbytes:
            raise ValueError("PNG scanline data size mismatch")
        pos += 1 + rowbytes
        o = y * rowbytes
        if ftype == 0:  # None
            out[o : o + rowbytes] = line
        elif ftype == 1:  # Sub
            for i in range(rowbytes):
                left = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            if prev_start < 0:
                out[o : o + rowbytes] = line
            else:
                for i in range(rowbytes):
                    out[o + i] = (line[i] + out[prev_start + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(rowbytes):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                out[o + i] = (line[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(rowbytes):
                left = out[o + i - bpp] if i >= bpp else 0
                up = out[prev_start + i] if prev_start >= 0 else 0
                ul = out[prev_start + i - bpp] if (prev_start >= 0 and i >= bpp) else 0
                out[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev_start = o
    return bytes(out), pos


def _png_samples(rows: bytes, w: int, h: int, channels: int, depth: int) -> list[int]:
    """Unfiltered rows → flat 8-bit samples (w*h*channels). 16-bit
    takes the high byte (the standard 8-bit reduction); sub-8-bit
    unpacks MSB-first and scales grayscale to full range (palette
    indices pass through unscaled)."""
    if depth == 8:
        return list(rows)
    rowbytes = (w * channels * depth + 7) // 8
    out: list[int] = []
    if depth == 16:
        for y in range(h):
            base = y * rowbytes
            for i in range(w * channels):
                out.append(rows[base + 2 * i])
        return out
    # depth 1 / 2 / 4, single channel by spec (gray or palette)
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    for y in range(h):
        base = y * rowbytes
        for x in range(w):
            b = rows[base + x // per_byte]
            shift = 8 - depth * (x % per_byte + 1)
            out.append((b >> shift) & mask)
    return out


def decode_png(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a PNG: bit depths 1/2/4/8/16, all five scanline filters,
    grayscale/LA/RGB/RGBA/palette color types, and both interlace
    methods (none and Adam7).

    Returns ``(width, height, mode, pixels)`` with ``pixels`` the raw
    scanlines concatenated (``width*height*channels`` bytes, palette
    already expanded to RGB so mode "P" never escapes). 16-bit samples
    reduce to their high byte; sub-8-bit grayscale scales to [0,255].
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, color_type, palette = 8, 0, 0, 0, b""
    depth, interlace = 8, 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if depth < 8 and color_type not in (0, 3):
                raise ValueError("sub-8-bit PNG must be grayscale or palette")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    channels = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
    bpp = max(1, channels * depth // 8)

    def rowbytes(w: int) -> int:
        return (w * channels * depth + 7) // 8

    if interlace == 0:
        rows, end = _png_unfilter(raw, 0, height, rowbytes(width), bpp)
        if end != len(raw):
            raise ValueError("PNG scanline data size mismatch")
        samples = _png_samples(rows, width, height, channels, depth)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        samples = [0] * (width * height * channels)
        rpos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, rpos = _png_unfilter(raw, rpos, ph, rowbytes(pw), bpp)
            sub = _png_samples(rows, pw, ph, channels, depth)
            for j in range(ph):
                for i in range(pw):
                    dst = ((y0 + j * dy) * width + (x0 + i * dx)) * channels
                    src = (j * pw + i) * channels
                    samples[dst : dst + channels] = sub[src : src + channels]
        if rpos != len(raw):
            raise ValueError("PNG scanline data size mismatch")
    if color_type == 3:
        if not palette:
            raise ValueError("palette PNG without PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(samples):
            if 3 * idx + 3 > len(palette):
                raise ValueError("PNG palette index out of range")
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, "RGB", bytes(rgb)
    if depth < 8:  # grayscale: scale to full 8-bit range
        scale = 255 // ((1 << depth) - 1)
        return width, height, _MODES[color_type], bytes(s * scale for s in samples)
    return width, height, _MODES[color_type], bytes(samples)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    filter_type: int = 0,
    palette: bytes | None = None,
) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced), used for fixtures
    and round-trip tests. ``filter_type`` applies one filter to every
    row so each decoder unfilter path can be exercised; mode "P"
    requires ``palette`` (RGB triples) and palette-index pixels."""
    ctype_by_mode = {"L": 0, "RGB": 2, "P": 3, "LA": 4, "RGBA": 6}
    color_type = ctype_by_mode[mode]
    channels = _CHANNELS[color_type]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:
            raw += bytes(
                (row[i] - (((row[i - channels] if i >= channels else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"bad filter type {filter_type}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    parts = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        parts.append(_chunk(b"PLTE", palette or b""))
    parts.append(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    parts.append(_chunk(b"IEND", b""))
    return b"".join(parts)


def decode_bmp(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode an uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER).
    Rows are 4-byte padded, bottom-up unless height is negative."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    width, height = struct.unpack("<ii", data[18:26])
    bpp, compression = struct.unpack("<HI", data[28:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row = data[pixel_off + src_y * row_bytes : pixel_off + src_y * row_bytes + width * 3]
        for x in range(width):
            b, g, r = row[3 * x : 3 * x + 3]
            o = (y * width + x) * 3
            out[o], out[o + 1], out[o + 2] = r, g, b
    return width, height, "RGB", bytes(out)


def decode_ppm(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode binary PPM (P6, maxval 255)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments start with '#'); pixel data follows the single
    # whitespace byte after maxval.
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise ValueError("PPM maxval != 255 unsupported")
    need = width * height * 3
    pixels = data[pos : pos + need]
    if len(pixels) != need:
        raise ValueError("PPM pixel data truncated")
    return width, height, "RGB", pixels


def _gif_lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytearray:
    """GIF-flavour LZW (LSB-first variable-width codes, clear/end
    codes, 12-bit cap). Stops after ``npix`` indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = end + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < npix:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: bytes([i]) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        elif code in table:
            entry = table[code]
            table[next_code] = prev + entry[:1]
            next_code += 1
        elif code == next_code:
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if next_code >= (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def decode_gif(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode the FIRST frame of a GIF87a/GIF89a.

    Full stdlib LZW (variable code width, clear/end, 12-bit cap),
    global and local color tables, interlace, and sub-rectangle
    frames composited onto the background-color canvas. Animation
    beyond frame one and transparency blending are out of scope —
    the multimodal feature path wants one representative raster.
    Returns ``(width, height, "RGB", pixels)``.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            if left + w > sw or top + h > sh:
                # a frame rect outside the logical screen would silently
                # desync the pixel buffer from the returned dims
                raise ValueError("GIF frame rect exceeds logical screen")
            ipacked = data[pos + 9]
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = data[pos : pos + 3 * n]
                pos += 3 * n
            if not table:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            idx = _gif_lzw_decode(min_code_size, bytes(lzw), w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    y
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                    for y in range(start, h, step)
                ]
                deinter = bytearray(w * h)
                for i, y in enumerate(order):
                    deinter[y * w : (y + 1) * w] = idx[i * w : (i + 1) * w]
                idx = deinter
            canvas = bytearray([bg_index]) * (sw * sh)
            for y in range(h):
                row = idx[y * w : (y + 1) * w]
                o = (top + y) * sw + left
                canvas[o : o + w] = row
            out = bytearray(sw * sh * 3)
            for i, ci in enumerate(canvas):
                c = 3 * ci
                out[3 * i : 3 * i + 3] = table[c : c + 3] if c + 3 <= len(table) else b"\x00\x00\x00"
            return sw, sh, "RGB", bytes(out)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def parse_gif_frames(
    data: bytes, max_frames: int = 64
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """ValueError-contract wrapper over :func:`_parse_gif_frames_impl`
    (truncated/corrupt GIFs must raise ValueError, never
    Index/struct errors, like every other codec here)."""
    try:
        return _parse_gif_frames_impl(data, max_frames)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"corrupt GIF: {exc!r}") from exc


def _parse_gif_frames_impl(
    data: bytes, max_frames: int
) -> tuple[int, int, list[tuple[int, bytes]]]:
    """Animated GIF89a → ``(width, height, [(delay_ms, rgb)])`` with
    full animation semantics: Graphic Control Extension delays,
    transparency (transparent pixels leave the canvas unchanged), and
    disposal methods 0/1 (leave), 2 (restore rect to background),
    3 (restore previous canvas). Each emitted frame is a complete
    RGB snapshot of the logical screen — what a player shows at that
    point of the timeline. ``decode_gif`` stays the single-raster
    still path; this is the video-sampling path."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    bg_rgb = (
        gct[3 * bg_index : 3 * bg_index + 3] if 3 * bg_index + 3 <= len(gct) else b"\x00\x00\x00"
    )
    canvas = bytearray(bg_rgb * (sw * sh))
    frames: list[tuple[int, bytes]] = []
    delay_ms, transp, disposal = 0, None, 0
    while pos < len(data) and len(frames) < max_frames:
        block = data[pos]
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and pos < len(data) and data[pos] >= 4:
                flags = data[pos + 1]
                delay_ms = struct.unpack("<H", data[pos + 2 : pos + 4])[0] * 10
                transp = data[pos + 4] if flags & 0x01 else None
                disposal = (flags >> 2) & 0x07
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame rect exceeds logical screen")
            ipacked = data[pos + 9]
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = data[pos : pos + 3 * n]
                pos += 3 * n
            if not table:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1  # block terminator
            idx = _gif_lzw_decode(min_code_size, bytes(lzw), w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            if ipacked & 0x40:  # interlaced
                order = [
                    y
                    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                    for y in range(start, h, step)
                ]
                deinter = bytearray(w * h)
                for i, y in enumerate(order):
                    deinter[y * w : (y + 1) * w] = idx[i * w : (i + 1) * w]
                idx = deinter
            saved = bytes(canvas) if disposal == 3 else None
            for y in range(h):
                for x in range(w):
                    ci = idx[y * w + x]
                    if transp is not None and ci == transp:
                        continue
                    c = 3 * ci
                    o = ((top + y) * sw + (left + x)) * 3
                    canvas[o : o + 3] = (
                        table[c : c + 3] if c + 3 <= len(table) else b"\x00\x00\x00"
                    )
            frames.append((delay_ms, bytes(canvas)))
            if disposal == 2:  # restore rect to background
                for y in range(h):
                    o = ((top + y) * sw + left) * 3
                    canvas[o : o + 3 * w] = bg_rgb * w
            elif disposal == 3 and saved is not None:
                canvas = bytearray(saved)
            delay_ms, transp, disposal = 0, None, 0
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return sw, sh, frames


def rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster → raw DIB pixel array (bottom-up BGR,
    4-byte-padded rows — the layout BMP files and AVI '00db' frame
    chunks share)."""
    row_bytes = (width * 3 + 3) & ~3
    dib = bytearray()
    for y in range(height - 1, -1, -1):
        line = bytearray()
        for x in range(width):
            o = (y * width + x) * 3
            line += bytes((rgb[o + 2], rgb[o + 1], rgb[o]))
        line += bytes(row_bytes - len(line))
        dib += line
    return bytes(dib)


def rgb_to_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB raster → 24-bit BMP file (rows flipped to the
    bottom-up BGR DIB layout :func:`encode_bmp` wraps)."""
    return encode_bmp(width, height, rgb_to_dib(width, height, rgb))


def encode_avi_dib(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    usec_per_frame: int = 100_000,
) -> bytes:
    """Uncompressed AVI writer (fixture-grade, like :func:`encode_png`
    / :func:`encode_bmp`): top-down RGB rasters → '00db' DIB frames in
    a RIFF 'AVI ' container with an avih header, exactly the subset
    :func:`parse_avi` plays back — so video-pipeline tests and the
    driver oracle queries can synthesize real, losslessly
    round-tripping video blobs with no media library."""
    dibs = [rgb_to_dib(width, height, rgb) for rgb in frames_rgb]
    # avih: usec/frame, max bytes/sec, padding, flags, total frames,
    # initial frames, streams, suggested buffer, width, height, rsvd×4
    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0, len(dibs), 0, 1, 0, width, height, 0, 0, 0, 0
    )
    hdrl_body = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl_body)) + b"hdrl" + hdrl_body
    movi_body = b"".join(
        b"00db" + struct.pack("<I", len(d)) + d + (b"\x00" if len(d) & 1 else b"")
        for d in dibs
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def iter_riff_chunks(data: bytes, pos: int, end: int):
    """Bounds-checked RIFF chunk walk shared by the AVI and WAV
    parsers → yields ``(fourcc, body_start, body_end)``. Bodies are
    CLAMPED to the available bytes (a lying size field or truncated
    file can never produce an out-of-range slice), and a chunk whose
    declared body runs past the end terminates the walk."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        declared_end = body_start + size
        body_end = min(declared_end, end)
        yield fourcc, body_start, body_end
        if declared_end > end:
            break
        pos = declared_end + (size & 1)


def parse_avi(data: bytes) -> tuple[int, int, int, list[tuple[str, bytes]]]:
    """Parse an AVI (RIFF) with stdlib struct only → ``(width, height,
    usec_per_frame, frames)`` where each frame is ``(kind, payload)``:

    - ``("dib", pixels)`` — a '..db' uncompressed device-independent
      bitmap (bottom-up BGR, the BMP layout; wrap with
      :func:`encode_bmp`);
    - ``("jpeg", bytes)`` — a '..dc' Motion-JPEG frame (each MJPEG
      frame is a complete JPEG stream, SOI magic checked), decodable
      by :func:`decode_jpeg_baseline` — MJPEG is the one compressed
      AVI codec a library-free stack can genuinely play.

    '..dc' frames of other codecs are skipped; a file with ONLY such
    frames raises (the caller's stub tier fires). Malformed input
    always raises ValueError (never struct.error)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    usec = width = height = None
    frames: list[tuple[str, bytes]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal usec, width, height
        for fourcc, body_start, body_end in iter_riff_chunks(data, pos, end):
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)
            elif fourcc == b"avih":
                if body_end - body_start < 40:
                    raise ValueError("truncated AVI avih chunk")
                (usec,) = struct.unpack("<I", data[body_start : body_start + 4])
                width, height = struct.unpack(
                    "<II", data[body_start + 32 : body_start + 40]
                )
            elif fourcc[2:4] == b"db":
                frames.append(("dib", bytes(data[body_start:body_end])))
            elif fourcc[2:4] == b"dc" and data[body_start : body_start + 2] == b"\xff\xd8":
                frames.append(("jpeg", bytes(data[body_start:body_end])))

    walk(12, len(data))
    if usec is None or width is None or not frames:
        raise ValueError("AVI missing avih header or decodable frames")
    return int(width), int(height), int(usec), frames


def encode_bmp(width: int, height: int, dib: bytes) -> bytes:
    """Wrap a raw DIB pixel array (bottom-up BGR, 4-byte-padded rows —
    exactly what an AVI '00db' chunk carries) into a 24-bit BMP file
    that :func:`decode_bmp` (or any viewer) reads."""
    header = struct.pack("<2sIHHI", b"BM", 54 + len(dib), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(dib), 2835, 2835, 0, 0
    )
    return header + info + dib


def decode_image_stdlib(data: bytes) -> tuple[int, int, str, bytes] | None:
    """Dispatch to whichever library-free decoder matches the magic
    bytes (PNG incl. Adam7/16-bit/sub-8-bit, GIF,
    baseline+progressive JPEG, lossless WebP, BMP, PPM); None for
    unrecognized magic; ValueError for recognized-but-corrupt or
    unsupported variants (arithmetic-coded JPEG, lossy-VP8 WebP, ...)
    so callers tier down explicitly."""
    try:
        if data[:8] == _PNG_SIG:
            return decode_png(data)
        if data[:2] == b"BM":
            return decode_bmp(data)
        if data[:2] == b"P6":
            return decode_ppm(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(data)
        if data[:2] == b"\xff\xd8":
            return decode_jpeg_baseline(data)
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            return decode_webp(data)
        return None
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, ZeroDivisionError, zlib.error) as exc:
        # truncated/corrupt containers (a GIF cut before byte 13, a
        # PNG with garbage IDAT deflate data) otherwise leak
        # struct.error/IndexError/zlib.error, breaking the
        # ValueError-only contract decode_jpeg_baseline already keeps
        raise ValueError(f"corrupt image container: {exc!r}") from exc


def luminance_cells(
    width: int, height: int, mode: str, pixels: bytes, tw: int, th: int
) -> list[tuple[int, int]]:
    """Integer box-sum grayscale grid → (luma_total, pixel_count) per
    tw×th cell, row-major. The EXACT-arithmetic core under both the
    float thumbnail feature and the perceptual hashes: keeping totals
    and counts as integers lets hash bit decisions use cross-
    multiplied integer comparisons (no float-tie ambiguity between
    engines)."""
    channels = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    out: list[tuple[int, int]] = []
    for j in range(th):
        y0, y1 = j * height // th, (j + 1) * height // th
        y1 = max(y1, y0 + 1)
        for i in range(tw):
            x0, x1 = i * width // tw, (i + 1) * width // tw
            x1 = max(x1, x0 + 1)
            total, count = 0, 0
            for y in range(min(y0, height - 1), min(y1, height)):
                base = y * width * channels
                for x in range(min(x0, width - 1), min(x1, width)):
                    o = base + x * channels
                    if channels >= 3:
                        lum = (299 * pixels[o] + 587 * pixels[o + 1] + 114 * pixels[o + 2] + 500) // 1000
                    else:
                        lum = pixels[o]
                    total += lum
                    count += 1
            out.append((total, count))
    return out


def luminance_thumbnail(
    width: int, height: int, mode: str, pixels: bytes, tw: int = 4, th: int = 2
) -> list[float]:
    """Box-mean grayscale thumbnail, the deterministic counterpart of
    PIL's convert("L").resize(): Rec.601 integer luma per pixel, then
    the mean over each of the tw×th cells, scaled to [0,1]. Engine-
    portable (no resampling-kernel ambiguity) so features compare
    across environments."""
    return [
        total / count / 255.0
        for total, count in luminance_cells(width, height, mode, pixels, tw, th)
    ]


# --- JPEG (baseline SOF0 + progressive SOF2) ---------------------------
#
# Scope: 8-bit Huffman entropy coding, grayscale or YCbCr with
# 4:4:4 / 4:2:0 sampling, optional restart markers; baseline
# sequential DCT (SOF0) and progressive DCT (SOF2) with both spectral
# selection and successive approximation — the scan scripts real
# encoders (cjpeg, web "optimized" JPEGs) actually emit. Hierarchical
# / lossless / arithmetic-coded variants raise ValueError and fall to
# the next decode tier. numpy does the 8x8 IDCT; everything else is
# stdlib byte/bit work. The zigzag order and the IDCT basis are
# DERIVED (not transcribed), so there is no hand-copied table to get
# wrong.


def _zigzag_order() -> list[int]:
    """The JPEG zigzag scan as a derivation: coefficients ordered by
    anti-diagonal, alternating direction — returns, for each scan
    position, the row-major index it maps to."""
    order = []
    for s in range(15):
        idx = [(i, s - i) for i in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            idx.reverse()  # even diagonals run bottom-left → top-right
        order.extend(r * 8 + c for r, c in idx)
    return order


_ZIGZAG = _zigzag_order()


def _idct_matrix():
    """8-point DCT-II basis (orthonormal); IDCT = basis.T @ X @ basis."""
    import math as _math

    import numpy as _np

    m = _np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            m[k, n] = _math.cos(_math.pi * k * (2 * n + 1) / 16) * (
                _math.sqrt(1 / 8) if k == 0 else _math.sqrt(2 / 8)
            )
    return m


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with JPEG
    byte-unstuffing (FF 00 → FF) and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        # _fill only runs when every buffered bit is consumed
        # (bits == 0), so REPLACE the accumulator — appending would
        # grow acc into an entropy-stream-sized bigint and make every
        # shift O(stream), turning big JPEGs into effective hangs
        self.acc = b
        self.bits = 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_restart(self) -> None:
        # caller consumed the RSTn marker bytes at self.pos
        self.pos += 2
        self.bits = 0
        self.acc = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman per the JPEG convention: ``bits[i]`` codes of
    length i+1, codes assigned in increasing order → map
    (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG signed-magnitude extension of a t-bit value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_baseline(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a Huffman JPEG — baseline sequential (SOF0) or
    progressive (SOF2, spectral selection + successive approximation)
    → (w, h, mode, pixels) with mode "L" (1 component) or "RGB"
    (YCbCr converted per JFIF). The name keeps the original public
    surface; ``decode_jpeg`` is the mode-neutral alias. Malformed
    input always raises ValueError (matching the other codecs'
    contract), never Index/Key/struct errors."""
    try:
        return _decode_jpeg_impl(data)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt JPEG: {exc!r}") from exc


decode_jpeg = decode_jpeg_baseline


def _decode_jpeg_impl(data: bytes) -> tuple[int, int, str, bytes]:
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    progressive = False
    prog = None  # accumulated-coefficient state for SOF2
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                ch, cv = samp >> 4, samp & 0x0F
                # a 0 factor would divide by zero computing MCU counts
                # (and >4 is out of spec) — reject here so the
                # ValueError-only contract holds for corrupt SOFs
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(f"invalid sampling factors {ch}x{cv}")
                comps.append((cid, ch, cv, tq))
            frame = (w, h, comps)
            progressive = marker == 0xC2
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline SOF0 / progressive SOF2 JPEG supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                values = list(body[i + 17 : i + 17 + nvals])
                huff[(tc, th)] = _build_huffman(bits, values)
                i += 17 + nvals
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 0x0F))
            pos = pos + 2 + seg_len
            if not progressive:
                return _decode_scan(
                    data, pos, frame, scan, qt, huff, restart_interval, np
                )
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated progressive SOS header")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            if prog is None:
                prog = _init_progressive(frame)
            pos = _decode_progressive_scan(
                data,
                pos,
                prog,
                scan,
                (ss, se, ahal >> 4, ahal & 0x0F),
                huff,
                restart_interval,
            )
            continue
        pos += 2 + seg_len
    if prog is not None and prog["scans"] > 0:
        return _finish_progressive(prog, qt, np)
    raise ValueError("JPEG has no scan")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval, np):
    if frame is None:
        raise ValueError("JPEG scan before frame header")
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    basis = _idct_matrix()
    planes = {
        cid: np.zeros((mcus_y * 8 * cv, mcus_x * 8 * ch))
        for cid, ch, cv, _tq in comps
    }
    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # byte-aligned RSTn between MCUs
                while data[reader.pos] != 0xFF or not (
                    0xD0 <= data[reader.pos + 1] <= 0xD7
                ):
                    reader.pos += 1
                reader.align_after_restart()
                pred = {cid: 0 for cid, *_ in comps}
            try:
                for cid, ch, cv, tq in comps:
                    td, ta = scan_by_cid[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            block = _decode_block(
                                reader,
                                huff[(0, td)],
                                huff[(1, ta)],
                                qt[tq],
                                pred,
                                cid,
                                np,
                            )
                            pix = basis.T @ block @ basis + 128.0
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartMarker:
                raise ValueError("restart marker inside MCU") from None
            mcu_count += 1
    return _assemble_pixels(planes, comps, hmax, vmax, w, h, np)


def _assemble_pixels(planes, comps, hmax, vmax, w, h, np):
    """Shared tail of both JPEG modes: chroma upsample, crop to image
    bounds, grayscale or JFIF YCbCr→RGB conversion."""
    out_planes = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:  # upsample subsampled chroma
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(out_planes[0].round(), 0, 255).astype(np.uint8)
        return w, h, "L", gray.tobytes()
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(x.round(), 0, 255) for x in (r, g, b)], axis=-1
    ).astype(np.uint8)
    return w, h, "RGB", rgb.tobytes()


# --- Progressive (SOF2) scan decoding ----------------------------------
#
# A progressive JPEG spreads each block's 64 zigzag coefficients over
# MANY scans: DC and AC bands arrive separately (spectral selection)
# and/or most-significant-bits first (successive approximation, Ah/Al).
# Decoding therefore accumulates integer coefficients per block across
# scans and runs dequantize+IDCT once at EOI. The four scan kinds
# (ITU-T T.81 §G.2): DC first, DC refine (one raw bit per block), AC
# first (with EOB-run coding), AC refine (correction bits woven into
# the runs).


def _init_progressive(frame: tuple) -> dict:
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    coefs = {}
    for cid, ch, cv, _tq in comps:
        rows, cols = mcus_y * cv, mcus_x * ch
        coefs[cid] = [[0] * 64 for _ in range(rows * cols)]
    return {
        "w": w,
        "h": h,
        "comps": comps,
        "hmax": hmax,
        "vmax": vmax,
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "coefs": coefs,
        "scans": 0,
    }


def _comp_block_grid(st: dict, comp: tuple) -> tuple[int, int, int]:
    """(block rows, block cols, padded grid stride) for one component.

    Non-interleaved scans walk the component's ACTUAL block grid
    (ceil(comp_size/8)); the padded MCU-aligned grid (the coefficient
    storage stride) can be wider for subsampled frames with
    non-MCU-aligned dimensions."""
    _cid, ch, cv, _tq = comp
    cw = -(-(st["w"] * ch) // st["hmax"])
    chh = -(-(st["h"] * cv) // st["vmax"])
    return -(-chh // 8), -(-cw // 8), st["mcus_x"] * ch


def _prog_restart(reader: _BitReader, data: bytes) -> None:
    """Byte-align onto the next RSTn and consume it (between restart
    intervals in a progressive scan)."""
    while data[reader.pos] != 0xFF or not (0xD0 <= data[reader.pos + 1] <= 0xD7):
        reader.pos += 1
    reader.align_after_restart()


def _first_ac(reader, table, coef, ss, se, al, eobrun):
    """AC band, first (Ah=0) scan for one block; returns new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: run of 2^r (+bits) all-done blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("JPEG AC run overflow")
        coef[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return eobrun


def _refine_ac(reader, table, coef, ss, se, al, eobrun):
    """AC band, refinement (Ah>0) scan for one block: each previously
    nonzero coefficient gets one correction bit (raising magnitude by
    1<<Al when set and not already carried); zero-history runs place
    newly nonzero ±1<<Al values; EOB runs still consume correction
    bits for the nonzero history they cover. Returns new EOB run."""
    p1 = 1 << al

    def correct(c):
        if (c & p1) == 0:
            return c + (p1 if c >= 0 else -p1)
        return c

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: skip 16 zero-history positions
            else:
                # refinement scans only ever code magnitude-1 newcomers
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                c = coef[k]
                if c:
                    if reader.read_bit():
                        coef[k] = correct(c)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = coef[k]
            if c and reader.read_bit():
                coef[k] = correct(c)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    data: bytes,
    pos: int,
    st: dict,
    scan: list[tuple[int, int, int]],
    spec: tuple[int, int, int, int],
    huff: dict,
    restart_interval: int,
) -> int:
    """Decode one progressive scan into the accumulated coefficient
    state; returns the position of the next marker after the scan's
    entropy data."""
    ss, se, ah, al = spec
    if not (0 <= ss <= se <= 63):
        raise ValueError("invalid progressive spectral selection")
    comps_by_cid = {c[0]: c for c in st["comps"]}
    reader = _BitReader(data, pos)
    pred = {c[0]: 0 for c in st["comps"]}
    eobrun = 0
    unit = 0

    def maybe_restart():
        nonlocal eobrun
        if restart_interval and unit and unit % restart_interval == 0:
            _prog_restart(reader, data)
            for cid in pred:
                pred[cid] = 0
            eobrun = 0

    def dc_block(cid, td, coef):
        if ah == 0:
            t = _huff_decode(reader, huff[(0, td)])
            pred[cid] += _extend(reader.read_bits(t), t) if t else 0
            coef[0] = pred[cid] << al
        elif reader.read_bit():
            coef[0] |= 1 << al

    try:
        if ss == 0:  # DC scan
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if len(scan) > 1:  # interleaved, MCU order
                for my in range(st["mcus_y"]):
                    for mx in range(st["mcus_x"]):
                        maybe_restart()
                        for cs, td, _ta in scan:
                            _cid, ch, cv, _tq = comps_by_cid[cs]
                            cols = st["mcus_x"] * ch
                            for by in range(cv):
                                for bx in range(ch):
                                    idx = (my * cv + by) * cols + (mx * ch + bx)
                                    dc_block(cs, td, st["coefs"][cs][idx])
                        unit += 1
            else:  # single component: raster over its block grid
                cs, td, _ta = scan[0]
                bh, bw, cols = _comp_block_grid(st, comps_by_cid[cs])
                for by in range(bh):
                    for bx in range(bw):
                        maybe_restart()
                        dc_block(cs, td, st["coefs"][cs][by * cols + bx])
                        unit += 1
        else:  # AC scan: always one component, raster order
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be single-component")
            cs, _td, ta = scan[0]
            table = huff[(1, ta)]
            bh, bw, cols = _comp_block_grid(st, comps_by_cid[cs])
            fn = _first_ac if ah == 0 else _refine_ac
            for by in range(bh):
                for bx in range(bw):
                    maybe_restart()
                    eobrun = fn(
                        reader, table, st["coefs"][cs][by * cols + bx], ss, se, al, eobrun
                    )
                    unit += 1
    except _RestartMarker:
        raise ValueError("restart marker inside progressive data unit") from None
    st["scans"] += 1
    # skip to the next real marker (stuffed FF00 and RSTn are data)
    p, n = reader.pos, len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def _finish_progressive(st: dict, qt: dict, np):
    basis = _idct_matrix()
    planes = {}
    for cid, ch, cv, tq in st["comps"]:
        if tq not in qt:
            raise ValueError("missing quantization table")
        q = qt[tq]
        rows, cols = st["mcus_y"] * cv, st["mcus_x"] * ch
        plane = np.zeros((rows * 8, cols * 8))
        blocks = st["coefs"][cid]
        for by in range(rows):
            for bx in range(cols):
                zz = blocks[by * cols + bx]
                block = np.zeros(64)
                for scan_pos, rm_idx in enumerate(_ZIGZAG):
                    block[rm_idx] = zz[scan_pos] * q[scan_pos]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    basis.T @ block.reshape(8, 8) @ basis + 128.0
                )
        planes[cid] = plane
    return _assemble_pixels(
        planes, st["comps"], st["hmax"], st["vmax"], st["w"], st["h"], np
    )


def _decode_block(reader, dc_table, ac_table, quant, pred, cid, np):
    coeffs = [0] * 64
    t = _huff_decode(reader, dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    coeffs[0] = pred[cid] * quant[0]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overflow")
        coeffs[k] = _extend(reader.read_bits(s), s) * quant[k]
        k += 1
    block = np.zeros(64)
    for scan_pos, rm_idx in enumerate(_ZIGZAG):
        block[rm_idx] = coeffs[scan_pos]
    return block.reshape(8, 8)


# --- WebP (VP8L lossless) ----------------------------------------------
#
# Scope: the complete VP8L lossless bitstream (RFC 9649 §3-5): LSB-
# first bit packing, canonical prefix codes (simple and code-length-
# coded), meta-prefix groups, color cache, LZ77 backward references
# with the 2-D distance neighborhood, and all four transforms
# (predictor, color/cross-color, subtract-green, color-indexing with
# pixel bundling). Lossy VP8 needs a boolean arithmetic decoder + loop
# filter and stays with the PIL tier (ValueError here). Constants that
# are normative spec tables (code-length order) are cited; the
# distance neighborhood is DERIVED from its ordering rule.

_VP8L_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _vp8l_distance_map() -> list[tuple[int, int]]:
    """The 120 closest already-decoded pixel offsets, ordered by
    squared Euclidean distance, then larger row offset first, then
    positive column offset first — the rule that generates the
    spec's distance-mapping table."""
    cand = [
        (dx, dy)
        for dy in range(9)
        for dx in range(-8, 9)
        if dy > 0 or dx > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], 0 if p[0] > 0 else 1, abs(p[0])))
    return cand[:120]


_VP8L_DIST_MAP = _vp8l_distance_map()


class _LsbReader:
    """LSB-first bit reader (VP8L packing: bit i of the stream is bit
    i of the value)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        v = 0
        p = self.pos
        for i in range(n):
            byte = self.data[(p + i) >> 3]
            v |= ((byte >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


def _rev_bits(code: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


def _vp8l_table(lengths: list[int]):
    """Canonical prefix code from code lengths → either an int (the
    lone symbol of a 0-bit code) or {(len, bits-as-read): symbol}.
    Codes assigned shortest-first, same-length by symbol order; the
    as-read key is the canonical code bit-reversed (VP8L serializes
    prefix codes LSB-of-stream-first). Incomplete codes raise."""
    used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
    if not used:
        raise ValueError("VP8L prefix code with no symbols")
    if len(used) == 1:
        return used[0][1]
    used.sort()
    kraft = sum(1.0 / (1 << ln) for ln, _ in used)
    if abs(kraft - 1.0) > 1e-9:
        raise ValueError("incomplete VP8L prefix code")
    table: dict[tuple[int, int], int] = {}
    code = 0
    prev_len = used[0][0]
    for ln, sym in used:
        code <<= ln - prev_len
        prev_len = ln
        table[(ln, _rev_bits(code, ln))] = sym
        code += 1
    return table


def _vp8l_sym(br: _LsbReader, table) -> int:
    if isinstance(table, int):
        return table
    code = 0
    for n in range(1, 16):
        code |= br.read(1) << (n - 1)
        sym = table.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("invalid VP8L prefix code")


def _vp8l_read_code(br: _LsbReader, alphabet_size: int):
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            s1 = br.read(8)
            if s1 >= alphabet_size or s1 == s0:
                raise ValueError("VP8L simple-code symbol invalid")
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
            return s0  # 0-bit code
        return _vp8l_table(lengths)
    num_codes = br.read(4) + 4
    if num_codes > len(_VP8L_CL_ORDER):
        raise ValueError("VP8L bad code-length count")
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_VP8L_CL_ORDER[i]] = br.read(3)
    cl_table = _vp8l_table(cl_lengths)
    if br.read(1):  # explicit max-symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = _vp8l_sym(br, cl_table)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _vp8l_table(lengths)


def _vp8l_prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length / distance prefix decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _vp8l_groups(br: _LsbReader, cache_bits: int, n: int = 1) -> list[list]:
    green_size = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    out = []
    for _ in range(n):
        out.append(
            [
                _vp8l_read_code(br, green_size),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 256),
                _vp8l_read_code(br, 40),
            ]
        )
    return out


def _vp8l_entropy_image(br: _LsbReader, w: int, h: int, level0: bool, transforms=None):
    """DecodeImageStream: [transforms (level 0 only)] + color cache +
    [meta-prefix (level 0 only)] + prefix codes + LZ77 pixel loop.
    Returns ARGB pixels as a flat list of ints (row-major, w*h)."""
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color
                size_bits = br.read(3) + 2
                tw = (w + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                timg = _vp8l_entropy_image(br, tw, th, False)
                # record the width this transform saw at READ time:
                # a color-indexing transform read earlier may have
                # reduced it, and the inverse must run at that width
                transforms.append((ttype, size_bits, timg, w))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, None, w))
            else:  # color indexing (palette)
                n_colors = br.read(8) + 1
                palette = _vp8l_entropy_image(br, n_colors, 1, False)
                # palette rows are delta-coded component-wise
                for i in range(1, n_colors):
                    a = (palette[i - 1] >> 24) & 0xFF
                    r = (palette[i - 1] >> 16) & 0xFF
                    g = (palette[i - 1] >> 8) & 0xFF
                    b = palette[i - 1] & 0xFF
                    palette[i] = (
                        (((palette[i] >> 24) + a) & 0xFF) << 24
                        | (((palette[i] >> 16) + r) & 0xFF) << 16
                        | ((((palette[i] >> 8) & 0xFF) + g) & 0xFF) << 8
                        | (((palette[i] & 0xFF) + b) & 0xFF)
                    )
                if n_colors <= 2:
                    xbits = 3
                elif n_colors <= 4:
                    xbits = 2
                elif n_colors <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append((3, xbits, (n_colors, palette), w))
                w = (w + (1 << xbits) - 1) >> xbits  # pixel bundling
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("VP8L bad color-cache size")
    cache = [0] * ((1 << cache_bits) if cache_bits else 0)
    meta = None
    meta_bits = 0
    ngroups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _vp8l_entropy_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        ngroups = max(meta) + 1
        meta_w = mw
    groups = _vp8l_groups(br, cache_bits, ngroups)

    def cache_insert(argb: int) -> None:
        if cache_bits:
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    npix = w * h
    pixels: list[int] = []
    while len(pixels) < npix:
        if meta is not None:
            i = len(pixels)
            gx, gy = (i % w) >> meta_bits, (i // w) >> meta_bits
            g = groups[meta[gy * meta_w + gx]]
        else:
            g = groups[0]
        s = _vp8l_sym(br, g[0])
        if s < 256:
            red = _vp8l_sym(br, g[1])
            blue = _vp8l_sym(br, g[2])
            alpha = _vp8l_sym(br, g[3])
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels.append(argb)
            cache_insert(argb)
        elif s < 280:
            length = _vp8l_prefix_value(br, s - 256)
            dist_code = _vp8l_prefix_value(br, _vp8l_sym(br, g[4]))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _VP8L_DIST_MAP[dist_code - 1]
                dist = max(1, dy * w + dx)
            if dist > len(pixels):
                raise ValueError("VP8L backward reference before start")
            for _ in range(min(length, npix - len(pixels))):
                argb = pixels[-dist]
                pixels.append(argb)
                cache_insert(argb)
        else:
            if not cache_bits:
                raise ValueError("VP8L cache symbol without cache")
            pixels.append(cache[s - 280])
    return pixels


def _vp8l_avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _vp8l_select(left: int, top: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        pc = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        p_l += abs(pc - ((left >> sh) & 0xFF))
        p_t += abs(pc - ((top >> sh) & 0xFF))
    return left if p_l < p_t else top


def _vp8l_clamp_full(left: int, top: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_clamp_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        v = a + int((a - ((tl >> sh) & 0xFF)) / 2)  # C-style trunc toward 0
        out |= max(0, min(255, v)) << sh
    return out


def _vp8l_add(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16)
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    ) & 0xFFFFFFFF


def _vp8l_apply_predictor(pixels: list[int], w: int, h: int, bits: int, timg: list[int]):
    tw = (w + (1 << bits) - 1) >> bits
    out = pixels  # in place: residual -> value
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]  # left
            elif x == 0:
                pred = out[i - w]  # top
            else:
                mode = (timg[(y >> bits) * tw + (x >> bits)] >> 8) & 0xFF
                left, top, tl = out[i - 1], out[i - w], out[i - w - 1]
                # for x == w-1 the flat index i-w+1 lands on THIS row's
                # first pixel (already decoded) — exactly the top-right
                # convention of contiguous row storage
                tr = out[i - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tr), top)
                elif mode == 6:
                    pred = _vp8l_avg2(left, tl)
                elif mode == 7:
                    pred = _vp8l_avg2(left, top)
                elif mode == 8:
                    pred = _vp8l_avg2(tl, top)
                elif mode == 9:
                    pred = _vp8l_avg2(top, tr)
                elif mode == 10:
                    pred = _vp8l_avg2(_vp8l_avg2(left, tl), _vp8l_avg2(top, tr))
                elif mode == 11:
                    pred = _vp8l_select(left, top, tl)
                elif mode == 12:
                    pred = _vp8l_clamp_full(left, top, tl)
                elif mode == 13:
                    pred = _vp8l_clamp_half(_vp8l_avg2(left, top), tl)
                else:
                    raise ValueError(f"VP8L bad predictor mode {mode}")
            out[i] = _vp8l_add(out[i], pred)


def _vp8l_apply_color(pixels: list[int], w: int, h: int, bits: int, timg: list[int]):
    def s8(v: int) -> int:
        return v - 256 if v >= 128 else v

    tw = (w + (1 << bits) - 1) >> bits
    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = timg[(y >> bits) * tw + (x >> bits)]
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            p = pixels[i]
            a = (p >> 24) & 0xFF
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r = (r + ((g2r * s8(g)) >> 5)) & 0xFF
            b = (b + ((g2b * s8(g)) >> 5)) & 0xFF
            b = (b + ((r2b * s8(r)) >> 5)) & 0xFF
            pixels[i] = (a << 24) | (r << 16) | (g << 8) | b


def decode_webp(data: bytes) -> tuple[int, int, str, bytes]:
    """Decode a lossless (VP8L) WebP → (w, h, "RGBA", pixels). Lossy
    VP8 and animated files raise ValueError so callers tier to PIL.
    Handles plain VP8L files and VP8X containers wrapping a VP8L
    chunk."""
    try:
        return _decode_webp_impl(data)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt WebP: {exc!r}") from exc


def _decode_webp_impl(data: bytes) -> tuple[int, int, str, bytes]:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    stream = None
    for fourcc, start, end in iter_riff_chunks(data, 12, len(data)):
        if fourcc == b"VP8L":
            stream = data[start:end]
            break
        if fourcc == b"VP8 ":
            raise ValueError("lossy (VP8) WebP unsupported — needs PIL tier")
    if stream is None:
        raise ValueError("WebP has no VP8L chunk")
    if not stream or stream[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(stream, 8)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list = []
    pixels = _vp8l_entropy_image(br, w, h, True, transforms)
    # inverse transforms, reverse order of appearance; each runs at
    # the width IT saw when read (a color-indexing transform read
    # before it may have bundled pixels and narrowed the image)
    for ttype, bits, payload, tw_read in reversed(transforms):
        if ttype == 3:  # color indexing (unbundle + palette lookup)
            n_colors, palette = payload
            packed_w = (tw_read + (1 << bits) - 1) >> bits
            out = [0] * (tw_read * h)
            per = 1 << bits
            bwidth = 8 >> bits
            mask = (1 << bwidth) - 1
            for y in range(h):
                for x in range(tw_read):
                    packed = pixels[y * packed_w + (x >> bits)]
                    idx = ((packed >> 8) & 0xFF) >> ((x % per) * bwidth) & mask
                    out[y * tw_read + x] = palette[idx] if idx < n_colors else 0
            pixels = out
        elif ttype == 2:  # add green back
            for i, p in enumerate(pixels):
                g = (p >> 8) & 0xFF
                pixels[i] = (
                    (p & 0xFF00FF00)
                    | ((((p >> 16) & 0xFF) + g & 0xFF) << 16)
                    | ((p & 0xFF) + g & 0xFF)
                )
        elif ttype == 1:
            _vp8l_apply_color(pixels, tw_read, h, bits, payload)
        else:
            _vp8l_apply_predictor(pixels, tw_read, h, bits, payload)
    if len(pixels) != w * h:
        raise ValueError("VP8L transform chain width mismatch")
    out_bytes = bytearray(w * h * 4)
    for i, p in enumerate(pixels):
        out_bytes[4 * i] = (p >> 16) & 0xFF
        out_bytes[4 * i + 1] = (p >> 8) & 0xFF
        out_bytes[4 * i + 2] = p & 0xFF
        out_bytes[4 * i + 3] = (p >> 24) & 0xFF
    return w, h, "RGBA", bytes(out_bytes)
