"""Stdlib image codec: PNG encode/decode round-trips across every
scanline filter and color type, BMP/PPM decode, box-mean thumbnail
semantics, and the real-decode tier of image_features."""

from __future__ import annotations

import struct
import zlib

import pytest

from data_pipeline_childcare_spark.sources.imagecodec import (
    decode_bmp,
    decode_image_stdlib,
    decode_png,
    decode_ppm,
    encode_png,
    luminance_thumbnail,
)


def _pattern(width: int, height: int, channels: int) -> bytes:
    """Deterministic, high-variance pixel pattern (exercises filters)."""
    return bytes(
        (x * 7 + y * 31 + c * 101 + (x * y) % 13) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


@pytest.mark.parametrize("mode,channels", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters_and_modes(mode, channels, filter_type):
    w, h = 13, 7  # odd sizes: exercises first-column/first-row edges
    pixels = _pattern(w, h, channels)
    blob = encode_png(w, h, pixels, mode=mode, filter_type=filter_type)
    rw, rh, rmode, rpix = decode_png(blob)
    assert (rw, rh, rmode) == (w, h, mode)
    assert rpix == pixels


def test_png_palette_expands_to_rgb():
    # 4 palette entries: black, red, green, blue
    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])  # 4x2
    blob = encode_png(4, 2, idx, mode="P", palette=palette)
    w, h, mode, pix = decode_png(blob)
    assert (w, h, mode) == (4, 2, "RGB")
    assert pix[:6] == bytes([0, 0, 0, 255, 0, 0])  # black, red
    assert pix[-3:] == bytes([0, 0, 0])


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    sig = b"\x89PNG\r\n\x1a\n"

    def ihdr_chunk(depth, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, interlace)
        return struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr)
        )

    # out-of-spec bit depth still rejected (16-bit is SUPPORTED now)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(sig + ihdr_chunk(3))
    with pytest.raises(ValueError, match="interlace"):
        decode_png(sig + ihdr_chunk(8, interlace=2))
    # a 16-bit header with no/corrupt IDAT keeps the ValueError contract
    with pytest.raises(ValueError):
        decode_png(sig + ihdr_chunk(16))


def _bmp_24(width: int, height: int, rows_rgb: list[list[tuple[int, int, int]]]) -> bytes:
    """Hand-built bottom-up 24-bit BMP."""
    row_bytes = (width * 3 + 3) & ~3
    body = bytearray()
    for row in reversed(rows_rgb):  # bottom-up storage
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])
        line += bytes(row_bytes - len(line))
        body += line
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<iiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info[:4] + info[4:] + body


def test_bmp_decode_bottom_up_and_padding():
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    w, h, mode, pix = decode_bmp(_bmp_24(3, 2, rows))
    assert (w, h, mode) == (3, 2, "RGB")
    assert pix[:3] == bytes([255, 0, 0])  # top-left is first row again
    assert pix[-3:] == bytes([70, 80, 90])


def test_ppm_decode_with_comment():
    blob = b"P6\n# a comment\n3 1\n255\n" + bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])
    w, h, mode, pix = decode_ppm(blob)
    assert (w, h, mode) == (3, 1, "RGB")
    assert pix == bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])


def test_dispatch_by_magic():
    png = encode_png(2, 2, _pattern(2, 2, 3), mode="RGB")
    assert decode_image_stdlib(png)[2] == "RGB"
    # JPEG magic now dispatches to the baseline decoder; corrupt data
    # raises (like a corrupt PNG) and the multimodal tier falls through
    with pytest.raises(ValueError):
        decode_image_stdlib(b"\xff\xd8\xff jpeg")
    assert decode_image_stdlib(b"\x00\x01not an image") is None


def test_luminance_thumbnail_known_values():
    # 4x2 RGB image, left half black, right half white → cells map 1:1
    pixels = bytes()
    for _y in range(2):
        pixels += bytes([0, 0, 0]) * 2 + bytes([255, 255, 255]) * 2
    feat = luminance_thumbnail(4, 2, "RGB", pixels, tw=4, th=2)
    assert feat == [0.0, 0.0, 1.0, 1.0, 0.0, 0.0, 1.0, 1.0]
    # gray ramp collapses to per-cell means
    gray = bytes([0, 100, 200, 250])
    feat_l = luminance_thumbnail(4, 1, "L", gray, tw=2, th=1)
    assert feat_l == [50 / 255.0, 225 / 255.0]


def test_image_features_real_decode_tier(spark):
    """A valid PNG payload must take the REAL stdlib decode path:
    true dims, true mode, box-mean feature, is_stub False."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    from data_pipeline_childcare_spark.sources.multimodal import image_features  # noqa: PLC0415

    w, h = 8, 4
    pixels = _pattern(w, h, 3)
    blob = encode_png(w, h, pixels, mode="RGB", filter_type=4)
    df = spark.createDataFrame(
        pd.DataFrame({"path": ["real.png"], "content": [blob]})
    ).withColumn("content", F.col("content").cast("binary"))
    row = image_features(df).first()
    assert (row["width"], row["height"], row["mode"]) == (w, h, "RGB")
    assert row["is_stub"] is False
    assert row["feature"] == pytest.approx(
        luminance_thumbnail(w, h, "RGB", pixels), abs=1e-6
    )


# --- GIF ---------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Reference GIF-LZW encoder (test-side only): variable-width
    LSB-first codes with dictionary growth, emitting clear at start
    and end-of-information at the end."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, code_size)]
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], code_size))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        buf = bytes([b])
    if buf:
        out_bits.append((table[buf], code_size))
    out_bits.append((end, code_size))
    acc = val = 0
    data = bytearray()
    for code, size in out_bits:
        val |= code << acc
        acc += size
        while acc >= 8:
            data.append(val & 0xFF)
            val >>= 8
            acc -= 8
    if acc:
        data.append(val & 0xFF)
    return bytes(data)


def _make_gif(
    w: int,
    h: int,
    palette: bytes,
    indices: bytes,
    interlace: bool = False,
    min_code_size: int = 2,
) -> bytes:
    n_colors = len(palette) // 3
    size_bits = max((n_colors - 1).bit_length(), 1) - 1
    gct = palette + b"\x00" * ((2 << size_bits) * 3 - len(palette))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | size_bits, 0, 0])
    out += gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code_size])
    lzw = _lzw_encode(min_code_size, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_roundtrip_with_dictionary_growth():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_gif

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    # repetitive pattern drives real dictionary growth in the encoder,
    # so the decoder's table-building path is exercised
    idx = bytes([(x // 3 + y) % 4 for y in range(16) for x in range(16)])
    gif = _make_gif(16, 16, palette, idx)
    w, h, mode, pixels = decode_gif(gif)
    assert (w, h, mode) == (16, 16, "RGB")
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert pixels == expect


def test_gif_interlaced_rows_reordered():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_gif

    palette = bytes([0, 0, 0, 255, 255, 255])
    h, w = 8, 4
    idx = bytes([y % 2 for y in range(h) for _ in range(w)])
    # encoder stores rows in interlace pass order
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(start, h, step)]
    stored = b"".join(idx[y * w : (y + 1) * w] for y in order)
    gif = _make_gif(w, h, palette, stored, interlace=True, min_code_size=2)
    _, _, _, pixels = decode_gif(gif)
    expect = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert pixels == expect


def test_gif_wellknown_1x1():
    """The canonical 1x1 transparent-pixel GIF used all over the web."""
    import base64

    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_gif,
        decode_image_stdlib,
    )

    gif = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, mode, pixels = decode_gif(gif)
    assert (w, h, mode) == (1, 1, "RGB")
    assert len(pixels) == 3
    assert decode_image_stdlib(gif) is not None


# --- AVI ---------------------------------------------------------------


def _chunk(fourcc, body):
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list_chunk(subtype, children):
    return _chunk(b"LIST", subtype + b"".join(children))


def _make_avi(w, h, usec_per_frame, colors):
    row_bytes = (w * 3 + 3) & ~3

    def dib(rgb):
        r, g, b = rgb
        row = bytes([b, g, r] * w) + b"\x00" * (row_bytes - w * 3)
        return row * h

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(colors), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    movi = _list_chunk(b"movi", [_chunk(b"00db", dib(c)) for c in colors])
    hdrl = _list_chunk(b"hdrl", [_chunk(b"avih", avih)])
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_parse_and_frame_bmp_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_bmp,
        encode_bmp,
        parse_avi,
    )

    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    avi = _make_avi(4, 2, 40000, colors)
    w, h, usec, frames = parse_avi(avi)
    assert (w, h, usec, len(frames)) == (4, 2, 40000, 3)
    for (kind, frame), rgb in zip(frames, colors):
        assert kind == "dib"
        dw, dh, mode, px = decode_bmp(encode_bmp(w, h, frame))
        assert (dw, dh, mode) == (4, 2, "RGB")
        assert px[:3] == bytes(rgb)


def _make_mjpeg_avi(w, h, usec_per_frame, shades):
    """AVI whose '00dc' stream carries Motion-JPEG frames (each a
    complete grayscale JPEG from the independent test-side encoder)."""
    frames = [
        _chunk(b"00dc", _jpeg_encode(bytes([shade]) * (w * h), w, h, mode="L"))
        for shade in shades
    ]
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(shades), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    movi = _list_chunk(b"movi", frames)
    hdrl = _list_chunk(b"hdrl", [_chunk(b"avih", avih)])
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_mjpeg_frames_decode_all_real(spark):
    """Motion-JPEG AVI: '00dc' frames are complete JPEGs, so the
    video → frames → image-features pipeline is all-real for the one
    compressed AVI codec a library-free stack can play."""
    from data_pipeline_childcare_spark.sources.imagecodec import parse_avi
    from data_pipeline_childcare_spark.sources.multimodal import (
        image_features,
        sample_frames,
    )

    shades = [10, 128, 240]
    avi = _make_mjpeg_avi(8, 8, 40000, shades)
    w, h, usec, frames = parse_avi(avi)
    assert (w, h, usec) == (8, 8, 40000)
    assert [k for k, _ in frames] == ["jpeg"] * 3

    df = spark.createDataFrame([("clip.avi", avi)], "path string, content binary")
    sampled = sample_frames(df, every_ms=40, max_frames=8).collect()
    assert [r["frame_ms"] for r in sampled] == [0, 40, 80]
    assert all(r["is_stub"] is False for r in sampled)
    fdf = spark.createDataFrame(
        [(f"f{r['frame_idx']}", bytes(r["frame"])) for r in sampled],
        "path string, content binary",
    )
    feats = {r["path"]: r for r in image_features(fdf, "path", "content").collect()}
    assert all(not r["is_stub"] and r["mode"] == "L" for r in feats.values())
    # flat frames: the decoded luminance thumbnail recovers each shade
    for i, shade in enumerate(shades):
        f0 = feats[f"f{i}"]["feature"][0]
        assert abs(f0 - shade / 255.0) < 0.02, (i, shade, f0)


def test_avi_non_mjpeg_dc_stream_stays_stub(spark):
    """A '00dc' stream that is NOT JPEG (e.g. a real codec bitstream)
    must not be misdecoded — the file falls to the stub tier."""
    from data_pipeline_childcare_spark.sources.multimodal import sample_frames

    avih = struct.pack("<IIIIIIIIIIIIII", 40000, 0, 0, 0, 1, 0, 1, 0, 4, 2, 0, 0, 0, 0)
    movi = _list_chunk(b"movi", [_chunk(b"00dc", b"\x00\x01codecbits" * 20)])
    hdrl = _list_chunk(b"hdrl", [_chunk(b"avih", avih)])
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([("v.avi", avi)], "path string, content binary")
    rows = sample_frames(df, every_ms=40, max_frames=3).collect()
    assert rows and all(r["is_stub"] is True for r in rows)


def test_video_frames_to_image_features_all_real(spark):
    """Uncompressed AVI → sampled frames → image features is an
    all-real stdlib pipeline: true timestamps from the avih header,
    BMP-decodable frames, non-stub features downstream."""
    from data_pipeline_childcare_spark.sources.multimodal import (
        image_features,
        sample_frames,
    )

    avi = _make_avi(4, 2, 40000, [(255, 0, 0), (0, 255, 0), (0, 0, 255)])
    df = spark.createDataFrame([("clip.avi", avi)], "path string, content binary")
    frames = sample_frames(df, every_ms=40, max_frames=8).collect()
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert [r["frame_ms"] for r in frames] == [0, 40, 80]
    assert all(r["is_stub"] is False for r in frames)
    fdf = spark.createDataFrame(
        [(f"f{r['frame_idx']}", bytes(r["frame"])) for r in frames],
        "path string, content binary",
    )
    feats = image_features(fdf, "path", "content").collect()
    assert all(not r["is_stub"] and r["mode"] == "RGB" for r in feats)


def test_video_frames_stub_tier_still_marked(spark):
    from data_pipeline_childcare_spark.sources.multimodal import sample_frames

    df = spark.createDataFrame(
        [("v.bin", bytes(range(256)))], "path string, content binary"
    )
    rows = sample_frames(df, every_ms=500, max_frames=3).collect()
    assert all(r["is_stub"] is True for r in rows)


# --- JPEG --------------------------------------------------------------
# Test-side baseline JPEG ENCODER: independent implementation (numpy
# forward DCT, its own canonical-Huffman assignment and bit writer) so
# the production decoder is exercised by a bitstream it did not write.

import numpy as _np

from data_pipeline_childcare_spark.sources.imagecodec import (
    _ZIGZAG,
    _idct_matrix,
)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1s per spec
        return bytes(self.out)


def _canonical_codes(symbols):
    """All symbols at 8 bits: valid canonical Huffman (≤ 256 syms)."""
    bits = [0] * 16
    bits[7] = len(symbols)
    values = sorted(symbols)
    codes = {}
    code = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[len(codes)]] = (length, code)
            code += 1
        code <<= 1
    return bits, values, codes


def _category(v):
    return 0 if v == 0 else abs(v).bit_length()


def _encode_blocks(writer, blocks_zz, dc_codes, ac_codes, pred):
    for zz in blocks_zz:
        diff = zz[0] - pred[0]
        pred[0] = zz[0]
        t = _category(diff)
        ln, code = dc_codes[t]
        writer.write(code, ln)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                writer.write(code, ln)
                run -= 16
            s = _category(zz[k])
            ln, code = ac_codes[(run << 4) | s]
            writer.write(code, ln)
            v = zz[k]
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = ac_codes[0x00]  # EOB
            writer.write(code, ln)


def _dct_zz(plane_block):
    basis = _idct_matrix()
    coef = basis @ (plane_block - 128.0) @ basis.T
    q = _np.rint(coef).astype(int)
    return [int(q.flat[idx]) for idx in _ZIGZAG]


def _jpeg_encode(pixels, w, h, mode="L", subsample=False):
    """Baseline JPEG with quant tables of all ones (near-lossless)."""
    import struct as _struct

    arr = _np.frombuffer(pixels, dtype=_np.uint8).astype(float)
    if mode == "L":
        planes = [arr.reshape(h, w)]
        samp = [(1, 1)]
    else:
        rgb = arr.reshape(h, w, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:  # 4:2:0 — chroma is the 2x2 box mean
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # pad planes to full MCU coverage
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * 8 * sv, mcus_x * 8 * sh
        pp = _np.zeros((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        padded.append(pp)
    # gather all symbols used so one Huffman table pair covers them
    dc_syms, ac_syms = set(), set()
    all_zz = {i: [] for i in range(len(planes))}
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        zz = _dct_zz(p[y0 : y0 + 8, x0 : x0 + 8])
                        all_zz[ci].append(zz)
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        dc_syms.add(_category(diff))
                        run = 0
                        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
                        for k in range(1, last_nz + 1):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                ac_syms.add(0xF0)
                                run -= 16
                            ac_syms.add((run << 4) | _category(zz[k]))
                            run = 0
                        if last_nz < 63:
                            ac_syms.add(0x00)
    dc_bits, dc_vals, dc_codes = _canonical_codes(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_codes(ac_syms)
    # entropy-coded data, interleaved by MCU
    writer = _BitWriter()
    preds = [0] * len(planes)
    idx = {i: 0 for i in range(len(planes))}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                n = sh * sv
                blocks = all_zz[ci][idx[ci] : idx[ci] + n]
                idx[ci] += n
                pred_box = [preds[ci]]
                _encode_blocks(writer, blocks, dc_codes, ac_codes, pred_box)
                preds[ci] = pred_box[0]
    entropy = writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))  # quant table 0: all 1s
    sof = _struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return out


def test_jpeg_grayscale_gradient_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 16, 8
    pixels = bytes(((x * 16 + y * 7) % 256) for y in range(h) for x in range(w))
    jpg = _jpeg_encode(pixels, w, h, mode="L")
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "L")
    err = max(abs(a - b) for a, b in zip(out, pixels))
    # quant=1: only DCT-coefficient rounding; error stays tiny
    assert err <= 2, err


def test_jpeg_rgb_444_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_image_stdlib,
        decode_jpeg_baseline,
    )

    w, h = 8, 8
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 30 % 256, y * 30 % 256, (x + y) * 15 % 256)
    )
    jpg = _jpeg_encode(rgb, w, h, mode="RGB")
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "RGB")
    err = max(abs(a - b) for a, b in zip(out, rgb))
    # YCbCr forward+inverse + DCT rounding
    assert err <= 4, err
    assert decode_image_stdlib(jpg) is not None


def test_jpeg_rgb_420_subsampled():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 16, 16
    # smooth content so 2x2 chroma box-mean loses little
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 8 + 64, y * 8 + 32, 128)
    )
    jpg = _jpeg_encode(rgb, w, h, mode="RGB", subsample=True)
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "RGB")
    err = max(abs(a - b) for a, b in zip(out, rgb))
    assert err <= 14, err  # chroma box-mean + upsample replication


# --- Progressive JPEG (test-side ENCODER) ------------------------------
# Independent SOF2 encoder so the production progressive decoder is
# exercised by a bitstream it did not write: spectral selection (DC
# scan + per-component AC band scans) and successive approximation
# (DC first/refine at Al=1→0, AC first/refine with EOB-run coding and
# buffered correction bits).


class _ProgSink:
    """Emit interface shared by the symbol-gathering pass and the real
    bit-writing pass."""

    def __init__(self, writer=None, dc_codes=None, ac_codes=None):
        self.writer = writer
        self.dc_codes, self.ac_codes = dc_codes, ac_codes
        self.dc_syms, self.ac_syms = set(), set()

    def sym_dc(self, s):
        self.dc_syms.add(s)
        if self.writer:
            ln, code = self.dc_codes[s]
            self.writer.write(code, ln)

    def sym_ac(self, s):
        self.ac_syms.add(s)
        if self.writer:
            ln, code = self.ac_codes[s]
            self.writer.write(code, ln)

    def bits(self, v, n):
        if n and self.writer:
            self.writer.write(v, n)


def _emit_dc_scan(sink, mcu_blocks, al, ah):
    """mcu_blocks: [(comp_idx, zz)] in MCU-interleaved order."""
    preds = {}
    for ci, zz in mcu_blocks:
        if ah == 0:
            v = zz[0] >> al  # arithmetic shift, mirrors decoder's <<
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            t = _category(diff)
            sink.sym_dc(t)
            sink.bits(diff if diff >= 0 else diff + (1 << t) - 1, t)
        else:
            sink.bits((zz[0] >> al) & 1, 1)


def _emit_ac_first(sink, blocks, ss, se, al):
    """AC band first scan (Ah=0): values at reduced precision
    sign*(abs>>Al); simple per-block EOB (no run accumulation)."""
    for zz in blocks:
        vals = {
            k: (abs(zz[k]) >> al) * (1 if zz[k] >= 0 else -1)
            for k in range(ss, se + 1)
        }
        last_nz = max((k for k in vals if vals[k]), default=ss - 1)
        run = 0
        for k in range(ss, last_nz + 1):
            v = vals[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                sink.sym_ac(0xF0)
                run -= 16
            s = _category(v)
            sink.sym_ac((run << 4) | s)
            sink.bits(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < se:
            sink.sym_ac(0x00)  # EOB, run of 1


def _emit_ac_refine(sink, blocks, ss, se, al):
    """AC band refinement scan (Ah=Al+1): newly nonzero coefficients
    (scaled magnitude exactly 1) as (run|1)+sign, correction bits for
    history coefficients buffered and emitted after each symbol, runs
    beyond the last newcomer folded into an EOB run."""
    state = {"eobrun": 0, "eob_bits": []}

    def flush_eob():
        if state["eobrun"]:
            nbits = state["eobrun"].bit_length() - 1
            sink.sym_ac(nbits << 4)
            sink.bits(state["eobrun"] - (1 << nbits), nbits)
            for b in state["eob_bits"]:
                sink.bits(b, 1)
            state["eobrun"] = 0
            state["eob_bits"] = []

    for zz in blocks:
        mags = {k: abs(zz[k]) >> al for k in range(ss, se + 1)}
        eob = max((k for k in mags if mags[k] == 1), default=ss - 1)
        r, br = 0, []
        for k in range(ss, se + 1):
            t = mags[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                flush_eob()
                sink.sym_ac(0xF0)
                r -= 16
                for b in br:
                    sink.bits(b, 1)
                br = []
            if t > 1:  # history: one buffered correction bit
                br.append(t & 1)
                continue
            flush_eob()
            sink.sym_ac((r << 4) | 1)
            sink.bits(1 if zz[k] >= 0 else 0, 1)
            for b in br:
                sink.bits(b, 1)
            r, br = 0, []
        if r > 0 or br:
            state["eobrun"] += 1
            state["eob_bits"].extend(br)
            if state["eobrun"] == 0x7FFF:
                flush_eob()
    flush_eob()


def _jpeg_encode_progressive(pixels, w, h, mode="L", subsample=False, successive=True):
    """Progressive JPEG, quant all-ones. ``successive=False`` emits a
    spectral-selection-only script (DC, then AC 1-63 per component at
    full precision); ``True`` adds successive approximation (DC and AC
    at Al=1, then refinement scans to Al=0)."""
    import struct as _struct

    arr = _np.frombuffer(pixels, dtype=_np.uint8).astype(float)
    if mode == "L":
        planes, samp = [arr.reshape(h, w)], [(1, 1)]
    else:
        rgb = arr.reshape(h, w, 3)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            planes, samp = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # zz coefficients on each component's padded MCU-aligned grid
    grids = []
    for p, (sh, sv) in zip(planes, samp):
        rows, cols = mcus_y * sv, mcus_x * sh
        pp = _np.zeros((rows * 8, cols * 8))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        grid = [
            [_dct_zz(pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]) for bx in range(cols)]
            for by in range(rows)
        ]
        grids.append(grid)
    mcu_blocks = []  # DC scan: interleaved MCU order
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        mcu_blocks.append((ci, grids[ci][my * sv + by][mx * sh + bx]))

    def comp_raster(ci):  # AC scans: actual block grid, raster order
        sh, sv = samp[ci]
        bw = -(-(-(-(w * sh) // hmax)) // 8)
        bh = -(-(-(-(h * sv) // vmax)) // 8)
        return [grids[ci][by][bx] for by in range(bh) for bx in range(bw)]

    if successive:
        scans = [("dc", None, 0, 0, 0, 1), ("dc", None, 0, 0, 1, 0)]
        for ci in range(len(planes)):
            scans.append(("ac", ci, 1, 63, 0, 1))
        for ci in range(len(planes)):
            scans.append(("ac", ci, 1, 63, 1, 0))
    else:
        scans = [("dc", None, 0, 0, 0, 0)]
        for ci in range(len(planes)):
            scans.append(("ac", ci, 1, 63, 0, 0))

    def run_scan(sink, kind, ci, ss, se, ah, al):
        if kind == "dc":
            _emit_dc_scan(sink, mcu_blocks, al, ah)
        elif ah == 0:
            _emit_ac_first(sink, comp_raster(ci), ss, se, al)
        else:
            _emit_ac_refine(sink, comp_raster(ci), ss, se, al)

    # pass 1: gather symbols for one shared DC and one shared AC table
    gather = _ProgSink()
    for sc in scans:
        run_scan(gather, *sc)
    dc_bits, dc_vals, dc_codes = _canonical_codes(gather.dc_syms or {0})
    ac_bits, ac_vals, ac_codes = _canonical_codes(gather.ac_syms or {0})

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = _struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    for kind, ci, ss, se, ah, al in scans:
        if kind == "dc":
            sos = bytes([len(planes)])
            for c in range(len(planes)):
                sos += bytes([c + 1, 0x00])
        else:
            sos = bytes([1, ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        writer = _BitWriter()
        run_scan(_ProgSink(writer, dc_codes, ac_codes), kind, ci, ss, se, ah, al)
        out += writer.flush()
    return out + b"\xff\xd9"


def test_jpeg_progressive_grayscale_spectral_only():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_image_stdlib,
        decode_jpeg_baseline,
    )

    w, h = 20, 12  # non-8-aligned: exercises the raster block grid
    pixels = bytes(((x * 16 + y * 7) % 256) for y in range(h) for x in range(w))
    jpg = _jpeg_encode_progressive(pixels, w, h, mode="L", successive=False)
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "L")
    err = max(abs(a - b) for a, b in zip(out, pixels))
    assert err <= 2, err
    assert decode_image_stdlib(jpg) is not None


def test_jpeg_progressive_grayscale_successive_approximation():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 24, 16
    pixels = bytes(((x * 13 + y * 29 + (x * y) // 3) % 256) for y in range(h) for x in range(w))
    jpg = _jpeg_encode_progressive(pixels, w, h, mode="L", successive=True)
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "L")
    # Al=1 first scans + refinement to Al=0 recover full precision
    err = max(abs(a - b) for a, b in zip(out, pixels))
    assert err <= 2, err


def test_jpeg_progressive_rgb_444_successive():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 8, 8
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (x * 30 % 256, y * 30 % 256, (x + y) * 15 % 256)
    )
    jpg = _jpeg_encode_progressive(rgb, w, h, mode="RGB", successive=True)
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "RGB")
    err = max(abs(a - b) for a, b in zip(out, rgb))
    assert err <= 4, err


def test_jpeg_progressive_rgb_420_nonaligned():
    """4:2:0 with width 34: the luma raster grid (5 blocks wide) is
    narrower than the padded MCU grid (6) — the non-interleaved AC
    scans must walk the ACTUAL grid while DC fills the padded one."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 34, 18
    rgb = bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in (min(x * 7 + 10, 255), min(y * 9 + 20, 255), 128)
    )
    # pad to even dims for the 2x2 chroma box-mean, then crop via SOF dims
    # (encoder requires even h/w for subsample): use 34x18 directly (even)
    jpg = _jpeg_encode_progressive(rgb, w, h, mode="RGB", subsample=True, successive=True)
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    assert (dw, dh, mode) == (w, h, "RGB")
    err = max(abs(a - b) for a, b in zip(out, rgb))
    assert err <= 14, err  # chroma box-mean + replication upsample


def test_jpeg_progressive_matches_baseline_decode():
    """The same image through the baseline and progressive encoders
    decodes to identical pixels (both quant-1, same DCT): the two
    decode paths agree bit-for-bit."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 16, 16
    pixels = bytes(((x * 5 + y * 11) % 256) for y in range(h) for x in range(w))
    base = decode_jpeg_baseline(_jpeg_encode(pixels, w, h, mode="L"))
    prog = decode_jpeg_baseline(
        _jpeg_encode_progressive(pixels, w, h, mode="L", successive=True)
    )
    assert base == prog


def test_jpeg_restart_markers():
    """DRI/RSTn: DC predictors reset and the bitstream re-aligns at
    each restart interval."""
    import struct as _struct

    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w, h = 32, 8
    pixels = bytes(((x * 11 + y * 3) % 256) for y in range(h) for x in range(w))
    arr = _np.frombuffer(pixels, dtype=_np.uint8).astype(float).reshape(h, w)
    zz_blocks = [_dct_zz(arr[:, i * 8 : (i + 1) * 8]) for i in range(w // 8)]
    RI = 2
    dc_syms, ac_syms = set(), set()
    pred = 0
    for i, zz in enumerate(zz_blocks):
        if i % RI == 0:
            pred = 0
        dc_syms.add(_category(zz[0] - pred))
        pred = zz[0]
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ac_syms.add(0xF0)
                run -= 16
            ac_syms.add((run << 4) | _category(zz[k]))
            run = 0
        if last_nz < 63:
            ac_syms.add(0x00)
    dc_bits, dc_vals, dc_codes = _canonical_codes(dc_syms)
    ac_bits, ac_vals, ac_codes = _canonical_codes(ac_syms)
    entropy = bytearray()
    writer = _BitWriter()
    rst = 0
    pred_box = [0]
    for i, zz in enumerate(zz_blocks):
        if i and i % RI == 0:
            entropy += writer.flush()
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
            pred_box = [0]
        _encode_blocks(writer, [zz], dc_codes, ac_codes, pred_box)
    entropy += writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + _struct.pack(">H", len(body) + 2) + body

    jpg = b"\xff\xd8"
    jpg += seg(0xDB, bytes([0]) + bytes([1] * 64))
    jpg += seg(0xC0, _struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    jpg += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    jpg += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    jpg += seg(0xDD, _struct.pack(">H", RI))
    jpg += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jpg += entropy + b"\xff\xd9"
    dw, dh, mode, dec = decode_jpeg_baseline(bytes(jpg))
    assert (dw, dh, mode) == (w, h, "L")
    assert max(abs(a - b) for a, b in zip(dec, pixels)) <= 2


def test_jpeg_large_image_decodes_quickly():
    """Regression: the bit reader must not accumulate the whole
    entropy stream into one bigint (O(N^2) decode). A 256x256 image
    decodes in well under the former minutes."""
    import time

    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    w = h = 256
    pixels = bytes(((x * 7 + y * 13) % 256) for y in range(h) for x in range(w))
    jpg = _jpeg_encode(pixels, w, h, mode="L")
    t0 = time.perf_counter()
    dw, dh, mode, out = decode_jpeg_baseline(jpg)
    dt = time.perf_counter() - t0
    assert (dw, dh, mode) == (w, h, "L")
    assert max(abs(a - b) for a, b in zip(out, pixels)) <= 2
    assert dt < 30, f"decode took {dt:.1f}s — quadratic bit reader regressed"


def test_jpeg_corrupt_raises_valueerror_only():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_jpeg_baseline,
    )

    good = _jpeg_encode(bytes(range(64)), 8, 8, mode="L")
    for bad in (
        good[: len(good) // 2],          # truncated mid-stream
        good[:-3] + b"\xff",              # entropy ends right after FF
        good.replace(b"\xff\xc4", b"\xff\xfe", 1),  # missing Huffman table
    ):
        with pytest.raises(ValueError):
            decode_jpeg_baseline(bad)
    # progressive streams keep the same contract: any truncation either
    # raises ValueError or decodes the partial scans (the progressive
    # rendering property) — never leaks Index/Key/struct errors
    prog = _jpeg_encode_progressive(bytes(range(64)), 8, 8, mode="L")
    for cut in range(2, len(prog), 7):
        try:
            decode_jpeg_baseline(prog[:cut])
        except ValueError:
            pass


def test_jpeg_zero_sampling_factor_raises_valueerror():
    """A corrupt SOF0 with 0 sampling factors used to escape as
    ZeroDivisionError from the MCU-count computation, leaking past the
    ValueError-only contract."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_jpeg_baseline

    sof0 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x00, 0])
    data = b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg_baseline(data)


def test_truncated_gif_raises_valueerror_not_struct_error():
    """A blob with a GIF magic but cut before the header end must
    raise ValueError from the dispatch, mirroring the JPEG decoder's
    hardening (module contract: ValueError for recognized-but-corrupt)."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_image_stdlib

    with pytest.raises(ValueError):
        decode_image_stdlib(b"GIF89a\x10\x00")


def test_png_garbage_idat_raises_valueerror():
    """Corrupt IDAT deflate data must surface as ValueError from the
    dispatch, not leak zlib.error."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_image_stdlib

    ihdr = struct.pack(">II", 2, 2) + bytes([8, 0, 0, 0, 0])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + struct.pack(">I", 8) + b"IDAT" + b"garbage!" + struct.pack(">I", zlib.crc32(b"IDAT" + b"garbage!"))
        + struct.pack(">I", 0) + b"IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )
    with pytest.raises(ValueError):
        decode_image_stdlib(png)


# --- WebP VP8L (test-side ENCODER) -------------------------------------
# Independent lossless-WebP encoder exercising the production decoder
# with streams it did not write: LSB-first packing, canonical prefix
# codes via the code-length code, optional subtract-green transform,
# color cache, and LZ77 run copies.

import heapq as _heapq

from data_pipeline_childcare_spark.sources.imagecodec import (
    _VP8L_CL_ORDER,
    _rev_bits,
)


class _LsbWriter:
    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def code(self, length, canonical):
        self.write(_rev_bits(canonical, length), length)

    def tobytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _huff_lengths(freqs, cap=15):
    syms = sorted(s for s, f in freqs.items() if f > 0)
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 0}

    def build(weights):
        heap = [(wt, s, ("leaf", s)) for s, wt in weights.items()]
        _heapq.heapify(heap)
        while len(heap) > 1:
            w1, t1, n1 = _heapq.heappop(heap)
            w2, t2, n2 = _heapq.heappop(heap)
            _heapq.heappush(heap, (w1 + w2, min(t1, t2), ("node", n1, n2)))
        depths = {}

        def walk(node, d):
            if node[0] == "leaf":
                depths[node[1]] = max(d, 1)
            else:
                walk(node[1], d + 1)
                walk(node[2], d + 1)

        walk(heap[0][2], 0)
        return depths

    depths = build({s: freqs[s] for s in syms})
    if max(depths.values()) > cap:
        depths = build({s: 1 for s in syms})
    return depths


def _canonical(lengths):
    pairs = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    codes = {}
    code = 0
    prev = pairs[0][0] if pairs else 0
    for ln, s in pairs:
        code <<= ln - prev
        prev = ln
        codes[s] = (ln, code)
        code += 1
    return codes


def _emit_tree(wtr, lengths, alphabet):
    """Serialize one prefix code; returns symbol→(len, code)."""
    used = sorted(lengths)
    if len(used) == 1:
        s0 = used[0]
        wtr.write(1, 1)  # simple
        wtr.write(0, 1)  # one symbol
        if s0 <= 1:
            wtr.write(0, 1)
            wtr.write(s0, 1)
        else:
            wtr.write(1, 1)
            wtr.write(s0, 8)
        return {s0: (0, 0)}
    if len(used) == 2 and all(lengths[s] == 1 for s in used):
        s0, s1 = used
        wtr.write(1, 1)
        wtr.write(1, 1)  # two symbols
        if s0 <= 1:
            wtr.write(0, 1)
            wtr.write(s0, 1)
        else:
            wtr.write(1, 1)
            wtr.write(s0, 8)
        wtr.write(s1, 8)
        return _canonical(lengths)
    wtr.write(0, 1)  # full code
    cl_seq = [lengths.get(s, 0) for s in range(alphabet)]
    cl_lengths = _huff_lengths({v: 1 for v in set(cl_seq)}, cap=7)
    if len(cl_lengths) == 1:  # degenerate: force a 2-symbol CL code
        only = next(iter(cl_lengths))
        other = 0 if only != 0 else 1
        cl_lengths = {only: 1, other: 1}
    cl_codes = _canonical(cl_lengths)
    num_codes = max(_VP8L_CL_ORDER.index(s) for s in cl_lengths) + 1
    num_codes = max(num_codes, 4)
    wtr.write(num_codes - 4, 4)
    for i in range(num_codes):
        wtr.write(cl_lengths.get(_VP8L_CL_ORDER[i], 0), 3)
    wtr.write(0, 1)  # no max-symbol shortcut
    for v in cl_seq:
        ln, code = cl_codes[v]
        wtr.code(ln, code)
    return _canonical(lengths)


def _prefix_encode(v):
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    e = x.bit_length() - 2
    if x >= (3 << e):
        return 2 * e + 3, e, x - (3 << e)
    return 2 * e + 2, e, x - (2 << e)


def _emit_image_body(wtr, px, cache_bits=0, rle=False):
    """NON-level-0 entropy image: cache bit + trees + tokens (used for
    transform sub-images, palettes, and meta images)."""
    if cache_bits:
        wtr.write(1, 1)
        wtr.write(cache_bits, 4)
    else:
        wtr.write(0, 1)
    _emit_image_tokens_only(wtr, px, cache_bits, rle)


def _emit_image_tokens_only(wtr, px, cache_bits=0, rle=False):
    """Five prefix codes + token stream (no stream-header bits)."""
    cache = [None] * (1 << cache_bits) if cache_bits else None

    def chash(p):
        return ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)

    tokens = []
    i = 0
    n = len(px)
    while i < n:
        if rle and i > 0 and px[i] == px[i - 1]:
            run = 1
            while i + run < n and px[i + run] == px[i]:
                run += 1
            if run >= 3:
                tokens.append(("copy", run, 1))
                if cache is not None:
                    for j in range(run):
                        cache[chash(px[i + j])] = px[i + j]
                i += run
                continue
        p = px[i]
        if cache is not None and cache[chash(p)] == p:
            tokens.append(("cache", chash(p)))
        else:
            tokens.append(("lit", p))
            if cache is not None:
                cache[chash(p)] = p
        i += 1

    gfreq, rfreq, bfreq, afreq, dfreq = {}, {}, {}, {}, {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            gfreq[(p >> 8) & 0xFF] = gfreq.get((p >> 8) & 0xFF, 0) + 1
            rfreq[(p >> 16) & 0xFF] = rfreq.get((p >> 16) & 0xFF, 0) + 1
            bfreq[p & 0xFF] = bfreq.get(p & 0xFF, 0) + 1
            afreq[(p >> 24) & 0xFF] = afreq.get((p >> 24) & 0xFF, 0) + 1
        elif t[0] == "cache":
            gfreq[280 + t[1]] = gfreq.get(280 + t[1], 0) + 1
        else:
            _k, run, dist = t
            lc, _, _ = _prefix_encode(run)
            dcode, _, _ = _prefix_encode(dist + 120)
            gfreq[256 + lc] = gfreq.get(256 + lc, 0) + 1
            dfreq[dcode] = dfreq.get(dcode, 0) + 1
    for f in (rfreq, bfreq, afreq, dfreq):
        if not f:
            f[0] = 1  # unused tree still needs one symbol

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    gc = _emit_tree(wtr, _huff_lengths(gfreq), green_alpha)
    rc = _emit_tree(wtr, _huff_lengths(rfreq), 256)
    bc = _emit_tree(wtr, _huff_lengths(bfreq), 256)
    ac = _emit_tree(wtr, _huff_lengths(afreq), 256)
    dc_ = _emit_tree(wtr, _huff_lengths(dfreq), 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            wtr.code(*gc[(p >> 8) & 0xFF])
            wtr.code(*rc[(p >> 16) & 0xFF])
            wtr.code(*bc[p & 0xFF])
            wtr.code(*ac[(p >> 24) & 0xFF])
        elif t[0] == "cache":
            wtr.code(*gc[280 + t[1]])
        else:
            _k, run, dist = t
            lc, le, lv = _prefix_encode(run)
            wtr.code(*gc[256 + lc])
            wtr.write(lv, le)
            dcode, de, dv = _prefix_encode(dist + 120)
            wtr.code(*dc_[dcode])
            wtr.write(dv, de)


def _vp8l_s8(v):
    return v - 256 if v >= 128 else v


def _vp8l_forward_predict(px, w, h, size_bits, modes):
    """Forward predictor transform: residual = orig - pred, predictors
    computed from ORIGINAL values in decoder scan order."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        _vp8l_avg2,
        _vp8l_clamp_full,
        _vp8l_clamp_half,
        _vp8l_select,
    )

    tw = (w + (1 << size_bits) - 1) >> size_bits

    def sub(a, b):
        return (
            ((((a >> 24) - (b >> 24)) & 0xFF) << 24)
            | ((((a >> 16) - (b >> 16)) & 0xFF) << 16)
            | ((((a >> 8) - (b >> 8)) & 0xFF) << 8)
            | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
        ) & 0xFFFFFFFF

    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if i == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = modes[(y >> size_bits) * tw + (x >> size_bits)]
                left, top, tl = px[i - 1], px[i - w], px[i - w - 1]
                tr = px[i - w + 1]  # x==w-1 wraps to this row's first pixel
                pred = [
                    lambda: 0xFF000000,
                    lambda: left,
                    lambda: top,
                    lambda: tr,
                    lambda: tl,
                    lambda: _vp8l_avg2(_vp8l_avg2(left, tr), top),
                    lambda: _vp8l_avg2(left, tl),
                    lambda: _vp8l_avg2(left, top),
                    lambda: _vp8l_avg2(tl, top),
                    lambda: _vp8l_avg2(top, tr),
                    lambda: _vp8l_avg2(_vp8l_avg2(left, tl), _vp8l_avg2(top, tr)),
                    lambda: _vp8l_select(left, top, tl),
                    lambda: _vp8l_clamp_full(left, top, tl),
                    lambda: _vp8l_clamp_half(_vp8l_avg2(left, top), tl),
                ][mode]()
            res.append(sub(px[i], pred))
    return res


def _vp8l_encode(
    w,
    h,
    rgba,
    subtract_green=False,
    cache_bits=0,
    rle=False,
    meta_bits=0,
    predictor_bits=0,
    color_bits=0,
    color_cte=None,
    palette=None,
):
    """rgba: flat [(r, g, b, a)] row-major. Optional transforms:
    subtract-green; predictor (size 2^predictor_bits tiles, modes
    cycling 0..13); cross-color (uniform cte = (g2r, g2b, r2b));
    palette (color-indexing with pixel bundling)."""
    import struct as _struct

    px = [(a << 24) | (r << 16) | (g << 8) | b for (r, g, b, a) in rgba]
    wtr = _LsbWriter()
    wtr.write(0x2F, 8)
    wtr.write(w - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(1, 1)  # alpha hint
    wtr.write(0, 3)  # version

    eff_w = w
    # Decoder semantics: main = Tn(...T1(original)) with T1 = first
    # transform READ; inverses run last-read-first. So the encoder
    # forward-applies in READ (write) order. Palette goes first so
    # its lookup sees original colors and later transforms (e.g. the
    # predictor) operate on the PACKED image — the bundling combo.
    pending = []
    if palette is not None:
        pending.append("pal")
    if predictor_bits:
        pending.append("pred")
    if color_bits:
        pending.append("color")
    if subtract_green:
        pending.append("sg")
    for t in pending:
        if t == "pal":
            lut = {c: i for i, c in enumerate(palette)}
            idx = [lut[p] for p in px]
            n_colors = len(palette)
            if n_colors <= 2:
                xbits = 3
            elif n_colors <= 4:
                xbits = 2
            elif n_colors <= 16:
                xbits = 1
            else:
                xbits = 0
            per = 1 << xbits
            bwidth = 8 >> xbits
            packed_w = (w + per - 1) // per
            packed = []
            for y in range(h):
                for bx in range(packed_w):
                    v = 0
                    for j in range(per):
                        x = bx * per + j
                        if x < w:
                            v |= idx[y * w + x] << (j * bwidth)
                    packed.append(0xFF000000 | (v << 8))
            px = packed
            eff_w = packed_w
        elif t == "sg":
            px = [
                (p & 0xFF00FF00)
                | ((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16
                | (((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF)
                for p in px
            ]
        elif t == "color":
            g2r, g2b, r2b = color_cte

            def delta(tv, c):
                return (_vp8l_s8(tv) * _vp8l_s8(c)) >> 5

            out = []
            for p in px:
                a, r, g, b = (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF
                nr = (r - delta(g2r, g)) & 0xFF
                nb = (b - delta(r2b, r) - delta(g2b, g)) & 0xFF
                out.append((a << 24) | (nr << 16) | (g << 8) | nb)
            px = out
        else:  # predictor
            tw = (eff_w + (1 << predictor_bits) - 1) >> predictor_bits
            th = (h + (1 << predictor_bits) - 1) >> predictor_bits
            modes = [t_i % 14 for t_i in range(tw * th)]
            px = _vp8l_forward_predict(px, eff_w, h, predictor_bits, modes)

    # write transform headers in READ order
    for t in pending:
        wtr.write(1, 1)
        if t == "pred":
            wtr.write(0, 2)
            wtr.write(predictor_bits - 2, 3)
            tw = (eff_w + (1 << predictor_bits) - 1) >> predictor_bits
            th = (h + (1 << predictor_bits) - 1) >> predictor_bits
            _emit_image_body(
                wtr, [0xFF000000 | ((t_i % 14) << 8) for t_i in range(tw * th)]
            )
        elif t == "color":
            wtr.write(1, 2)
            wtr.write(color_bits - 2, 3)
            tw = (eff_w + (1 << color_bits) - 1) >> color_bits
            th = (h + (1 << color_bits) - 1) >> color_bits
            g2r, g2b, r2b = color_cte
            cte_pixel = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
            _emit_image_body(wtr, [cte_pixel] * (tw * th))
        elif t == "sg":
            wtr.write(2, 2)
        else:  # palette
            wtr.write(3, 2)
            wtr.write(len(palette) - 1, 8)
            deltas = []
            prev = 0
            for c in palette:
                deltas.append(
                    ((((c >> 24) - (prev >> 24)) & 0xFF) << 24)
                    | ((((c >> 16) - (prev >> 16)) & 0xFF) << 16)
                    | ((((c >> 8) - (prev >> 8)) & 0xFF) << 8)
                    | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
                )
                prev = c
            _emit_image_body(wtr, deltas)
    wtr.write(0, 1)  # end of transforms

    # main image: cache bit + optional meta + trees + tokens
    if meta_bits:
        # emit cache bit then meta header inline (level-0 stream)
        if cache_bits:
            wtr.write(1, 1)
            wtr.write(cache_bits, 4)
        else:
            wtr.write(0, 1)
        wtr.write(1, 1)
        wtr.write(meta_bits - 2, 3)
        _emit_image_body(wtr, [0xFF000000])  # 1x1 meta image → group 0
        # trees + tokens via the body helper minus its cache/meta bits
        _emit_image_tokens_only(wtr, px, cache_bits, rle)
    else:
        if cache_bits:
            wtr.write(1, 1)
            wtr.write(cache_bits, 4)
        else:
            wtr.write(0, 1)
        wtr.write(0, 1)  # no meta-prefix
        _emit_image_tokens_only(wtr, px, cache_bits, rle)

    payload = wtr.tobytes()
    chunk = b"VP8L" + _struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def _rgba_pattern(w, h):
    return [
        ((x * 17 + y * 3) % 256, (x * 5 + y * 29) % 256, (x + y * 7) % 256, 255)
        for y in range(h)
        for x in range(w)
    ]


def test_webp_vp8l_literal_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_image_stdlib,
        decode_webp,
    )

    w, h = 13, 7
    rgba = _rgba_pattern(w, h)
    blob = _vp8l_encode(w, h, rgba)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    expect = bytes(v for px in rgba for v in px)
    assert out == expect
    assert decode_image_stdlib(blob) == (w, h, "RGBA", expect)


def test_webp_vp8l_subtract_green_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 9, 5
    rgba = _rgba_pattern(w, h)
    blob = _vp8l_encode(w, h, rgba, subtract_green=True)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


def test_webp_vp8l_color_cache_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 16, 8
    # few distinct colors repeating non-contiguously → cache hits
    colors = [(250, 10, 10, 255), (10, 250, 10, 255), (10, 10, 250, 200), (0, 0, 0, 255)]
    rgba = [colors[(x * 3 + y) % 4] for y in range(h) for x in range(w)]
    blob = _vp8l_encode(w, h, rgba, cache_bits=4)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


def test_webp_vp8l_lz77_runs_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 24, 6
    # flat banded image → long dist-1 copies through the LZ77 path
    rgba = [
        (200, 50, 25, 255) if y < 2 else (25, 50, 200, 255) if y < 4 else (1, 2, 3, 128)
        for y in range(h)
        for _x in range(w)
    ]
    blob = _vp8l_encode(w, h, rgba, rle=True)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)
    # combined: rle + cache + subtract-green through one stream
    blob2 = _vp8l_encode(w, h, rgba, rle=True, cache_bits=3, subtract_green=True)
    assert decode_webp(blob2)[3] == bytes(v for px in rgba for v in px)


def test_webp_lossy_and_corrupt_contract():
    import struct as _struct

    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_image_stdlib,
        decode_webp,
    )

    lossy = b"RIFF" + _struct.pack("<I", 12) + b"WEBP" + b"VP8 " + _struct.pack("<I", 0)
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)
    good = _vp8l_encode(4, 4, _rgba_pattern(4, 4))
    for cut in range(12, len(good), 3):
        try:
            decode_image_stdlib(good[:cut])
        except ValueError:
            pass


def test_webp_through_image_features(spark):
    """WebP rides the REAL tier-1 decode path end-to-end."""
    from data_pipeline_childcare_spark.sources.multimodal import image_features

    w, h = 8, 4
    rgba = [(x * 30 % 256, y * 60 % 256, 128, 255) for y in range(h) for x in range(w)]
    blob = _vp8l_encode(w, h, rgba, subtract_green=True)
    df = spark.createDataFrame([("pic.webp", blob)], "path string, content binary")
    row = image_features(df).first()
    assert (row["width"], row["height"], row["mode"]) == (w, h, "RGBA")
    assert row["is_stub"] is False


def test_webp_vp8l_predictor_all_modes_roundtrip():
    """Predictor transform with 4x4 tiles cycling through ALL 14
    predictor modes across a 32x16 image — exact reconstruction."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 32, 16
    rgba = [
        ((x * 9 + y * 2) % 256, (x * 3 + y * 11) % 256, (x * 5 + y * 13) % 256, 255)
        for y in range(h)
        for x in range(w)
    ]
    blob = _vp8l_encode(w, h, rgba, predictor_bits=2)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


def test_webp_vp8l_color_transform_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 12, 10
    rgba = _rgba_pattern(w, h)
    blob = _vp8l_encode(w, h, rgba, color_bits=3, color_cte=(0x40, 0xE0, 0x15))
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


@pytest.mark.parametrize("n_colors", [2, 4, 11, 40])
def test_webp_vp8l_palette_bundling_roundtrip(n_colors):
    """Color-indexing transform at every bundling width (8/4/2/1
    pixels per byte), including a non-aligned image width."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 21, 5
    palette = [
        (0xFF000000 | ((i * 37 % 256) << 16) | ((i * 91 % 256) << 8) | (i * 13 % 256))
        for i in range(n_colors)
    ]
    pal_rgba = [((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, 255) for c in palette]
    rgba = [pal_rgba[(x * 7 + y * 3) % n_colors] for y in range(h) for x in range(w)]
    blob = _vp8l_encode(w, h, rgba, palette=palette)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


def test_webp_vp8l_meta_prefix_header_roundtrip():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 10, 6
    rgba = _rgba_pattern(w, h)
    blob = _vp8l_encode(w, h, rgba, meta_bits=6)  # one 64x64 tile → 1 group
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


# --- PNG: Adam7 interlace + non-8-bit depths ---------------------------


def _raw_png(w, h, depth, color_type, raw_scanlines, interlace=0, palette=b""):
    import struct as _struct
    import zlib as _zlib

    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", _zlib.crc32(ctype + body))
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", _zlib.compress(raw_scanlines)) + chunk(b"IEND", b"")
    return out


def test_png_adam7_interlaced_roundtrip():
    """Adam7: seven independently filtered sub-images scatter back to
    the full grid — verified against the same image stored
    non-interlaced, with a non-zero filter inside one pass."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        _ADAM7,
        decode_png,
    )

    w, h = 9, 10  # non-multiple-of-8: exercises partial passes
    pixels = _pattern(w, h, 3)

    def px(x, y):
        return pixels[(y * w + x) * 3 : (y * w + x) * 3 + 3]

    raw = bytearray()
    for pi, (x0, y0, dx, dy) in enumerate(_ADAM7):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        prev = bytearray(pw * 3)
        for j in range(ph):
            line = bytearray()
            for i in range(pw):
                line += px(x0 + i * dx, y0 + j * dy)
            if pi % 2 == 1:  # alternate passes use the Up filter
                enc = bytes((line[k] - prev[k]) & 0xFF for k in range(len(line)))
                raw += b"\x02" + enc
            else:
                raw += b"\x00" + bytes(line)
            prev = line
    blob = _raw_png(w, h, 8, 2, bytes(raw), interlace=1)
    dw, dh, mode, out = decode_png(blob)
    assert (dw, dh, mode) == (w, h, "RGB")
    assert out == pixels


def test_png_16bit_reduces_to_high_byte():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_png

    w, h = 5, 3
    hi = _pattern(w, h, 3)
    raw = bytearray()
    k = 0
    for _y in range(h):
        raw += b"\x00"
        for _i in range(w * 3):
            raw += bytes([hi[k], (hi[k] * 7 + 3) % 256])  # hi, lo
            k += 1
    dw, dh, mode, out = decode_png(_raw_png(w, h, 16, 2, bytes(raw)))
    assert (dw, dh, mode) == (w, h, "RGB")
    assert out == hi


def test_png_sub8bit_gray_and_palette():
    from data_pipeline_childcare_spark.sources.imagecodec import decode_png

    # 4-bit grayscale, odd width (padding bits in the last byte)
    w, h = 5, 2
    vals = [[1, 15, 0, 7, 8], [3, 3, 12, 5, 10]]
    raw = bytearray()
    for row in vals:
        raw += b"\x00"
        packed = bytearray()
        for i in range(0, len(row), 2):
            hi = row[i] << 4
            lo = row[i + 1] if i + 1 < len(row) else 0
            packed.append(hi | lo)
        raw += packed
    dw, dh, mode, out = decode_png(_raw_png(w, h, 4, 0, bytes(raw)))
    assert (dw, dh, mode) == (w, h, "L")
    assert list(out) == [v * 17 for row in vals for v in row]

    # 1-bit grayscale
    raw1 = b"\x00" + bytes([0b10110000])  # 4px row: 1,0,1,1
    dw, dh, mode, out = decode_png(_raw_png(4, 1, 1, 0, raw1))
    assert list(out) == [255, 0, 255, 255]

    # 2-bit palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw2 = b"\x00" + bytes([0b00011011])  # indices 0,1,2,3
    dw, dh, mode, out = decode_png(_raw_png(4, 1, 2, 3, raw2, palette=pal))
    assert mode == "RGB" and bytes(out) == pal


def test_png_adam7_through_dispatch(spark):
    from data_pipeline_childcare_spark.sources.multimodal import image_features

    w, h = 8, 8
    pixels = _pattern(w, h, 3)
    raw = bytearray()
    from data_pipeline_childcare_spark.sources.imagecodec import _ADAM7

    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        for j in range(ph):
            raw += b"\x00"
            for i in range(pw):
                p = ((y0 + j * dy) * w + (x0 + i * dx)) * 3
                raw += pixels[p : p + 3]
    blob = _raw_png(w, h, 8, 2, bytes(raw), interlace=1)
    df = spark.createDataFrame([("i.png", blob)], "path string, content binary")
    row = image_features(df).first()
    assert (row["width"], row["height"], row["mode"], row["is_stub"]) == (w, h, "RGB", False)


# --- animated GIF ------------------------------------------------------


def _gce(delay_cs, transp=None, disposal=0):
    flags = (disposal << 2) | (1 if transp is not None else 0)
    return (
        bytes([0x21, 0xF9, 4, flags])
        + struct.pack("<H", delay_cs)
        + bytes([transp if transp is not None else 0, 0])
    )


def _gif_frame(left, top, w, h, indices, min_code_size=2):
    out = b"\x2c" + struct.pack("<HHHH", left, top, w, h) + bytes([0])
    out += bytes([min_code_size])
    lzw = _lzw_encode(min_code_size, bytes(indices))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def _animated_gif():
    """4x2 screen, palette black/red/green/blue: full red frame
    (50 ms) → green right-half with disposal=restore-background
    (100 ms) → transparent-holed blue pixel over the restored canvas."""
    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a") + struct.pack("<HH", 4, 2) + bytes([0x81, 0, 0]) + palette
    out += _gce(5) + _gif_frame(0, 0, 4, 2, [1] * 8)
    out += _gce(10, disposal=2) + _gif_frame(2, 0, 2, 2, [2] * 4)
    out += _gce(10, transp=0) + _gif_frame(0, 0, 2, 1, [3, 0])
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_frames_composite():
    from data_pipeline_childcare_spark.sources.imagecodec import parse_gif_frames

    sw, sh, frames = parse_gif_frames(_animated_gif())
    assert (sw, sh) == (4, 2)
    assert [d for d, _ in frames] == [50, 100, 100]
    R, G, B, K = (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 0, 0)

    def grid(rgb):
        return [tuple(rgb[3 * i : 3 * i + 3]) for i in range(8)]

    assert grid(frames[0][1]) == [R, R, R, R, R, R, R, R]
    assert grid(frames[1][1]) == [R, R, G, G, R, R, G, G]
    # disposal 2 restored the green rect to background (black) before
    # frame 3; the transparent pixel (1,0) keeps the red underneath
    assert grid(frames[2][1]) == [B, R, K, K, R, R, K, K]


def test_gif_animation_through_sample_frames(spark):
    from data_pipeline_childcare_spark.sources.imagecodec import decode_bmp
    from data_pipeline_childcare_spark.sources.multimodal import sample_frames

    df = spark.createDataFrame(
        [("anim.gif", _animated_gif())], "path string, content binary"
    )
    rows = sample_frames(df, every_ms=100, max_frames=8).collect()
    # timeline: f0 at 0 ms (emit), f1 at 50 ms (skip), f2 at 150 ms (emit)
    assert [(r["frame_idx"], r["frame_ms"]) for r in rows] == [(0, 0), (2, 150)]
    assert all(r["is_stub"] is False for r in rows)
    w, h, mode, px = decode_bmp(bytes(rows[0]["frame"]))
    assert (w, h, mode) == (4, 2, "RGB") and px[:3] == bytes([255, 0, 0])
    w, h, mode, px = decode_bmp(bytes(rows[1]["frame"]))
    assert px[:3] == bytes([0, 0, 255])  # frame-3 snapshot starts blue


def test_webp_vp8l_palette_plus_predictor_bundled_roundtrip():
    """The spec-legal combo the width bookkeeping must survive:
    color-indexing (pixel bundling narrows the image) READ FIRST,
    then a predictor transform operating on the PACKED image — each
    inverse must run at the width its transform saw at read time."""
    from data_pipeline_childcare_spark.sources.imagecodec import decode_webp

    w, h = 19, 6  # 4 colors → xbits=2 → packed width ceil(19/4)=5
    palette = [0xFF000000 | c for c in (0x102030, 0x405060, 0x708090, 0xA0B0C0)]
    pal_rgba = [((c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF, 255) for c in palette]
    rgba = [pal_rgba[(x * 3 + y) % 4] for y in range(h) for x in range(w)]
    blob = _vp8l_encode(w, h, rgba, palette=palette, predictor_bits=2)
    dw, dh, mode, out = decode_webp(blob)
    assert (dw, dh, mode) == (w, h, "RGBA")
    assert out == bytes(v for px in rgba for v in px)


def test_gif_parse_frames_valueerror_contract():
    from data_pipeline_childcare_spark.sources.imagecodec import parse_gif_frames

    good = _animated_gif()
    for cut in list(range(2, 14)) + list(range(14, len(good), 5)):
        try:
            parse_gif_frames(good[:cut])
        except ValueError:
            pass  # the ONLY allowed failure mode


def test_gif_long_animation_not_truncated_by_parse_cap(spark):
    """A 120-frame GIF sampled sparsely must cover the WHOLE timeline
    — the sampler sizes the decode cap from its budget instead of
    stopping at a fixed 64 frames."""
    from data_pipeline_childcare_spark.sources.multimodal import sample_frames

    palette = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    out = bytearray(b"GIF89a") + struct.pack("<HH", 2, 1) + bytes([0x81, 0, 0]) + palette
    for i in range(120):
        out += _gce(10) + _gif_frame(0, 0, 2, 1, [i % 4, (i + 1) % 4])  # 100 ms each
    out += b"\x3b"
    df = spark.createDataFrame([("long.gif", bytes(out))], "path string, content binary")
    rows = sample_frames(df, every_ms=3000, max_frames=5).collect()
    # samples at 0, 3000, 6000, 9000 ms → frames 0, 30, 60, 90
    assert [(r["frame_idx"], r["frame_ms"]) for r in rows] == [
        (0, 0), (30, 3000), (60, 6000), (90, 9000),
    ]


def test_encode_avi_dib_round_trips_through_parse_avi():
    """The fixture AVI writer must produce exactly the subset
    parse_avi plays back, losslessly: header fields and every frame's
    RGB raster."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_bmp,
        encode_avi_dib,
        encode_bmp,
        parse_avi,
    )

    frames = [bytes((f * 29 + i * 7) % 256 for i in range(8 * 8 * 3)) for f in range(3)]
    avi = encode_avi_dib(8, 8, frames, usec_per_frame=40_000)
    w, h, usec, out = parse_avi(avi)
    assert (w, h, usec) == (8, 8, 40_000)
    assert [k for k, _ in out] == ["dib"] * 3
    for f, (_, dib) in enumerate(out):
        assert decode_bmp(encode_bmp(8, 8, dib))[3] == frames[f]


def test_encode_avi_dib_odd_width_padding():
    """5-px-wide rows need 4-byte padding in the DIB layout; the
    padding must survive the container round trip."""
    from data_pipeline_childcare_spark.sources.imagecodec import (
        decode_bmp,
        encode_avi_dib,
        encode_bmp,
        parse_avi,
    )

    rgb = bytes((i * 3) % 256 for i in range(5 * 4 * 3))
    w, h, usec, out = parse_avi(encode_avi_dib(5, 4, [rgb]))
    assert decode_bmp(encode_bmp(5, 4, out[0][1]))[3] == rgb
