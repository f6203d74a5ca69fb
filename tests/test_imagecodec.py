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
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    sig = b"\x89PNG\r\n\x1a\n"
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(sig + chunk)


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
    assert decode_image_stdlib(b"\xff\xd8\xff jpeg") is None  # needs PIL


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
    for frame, rgb in zip(frames, colors):
        dw, dh, mode, px = decode_bmp(encode_bmp(w, h, frame))
        assert (dw, dh, mode) == (4, 2, "RGB")
        assert px[:3] == bytes(rgb)


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
