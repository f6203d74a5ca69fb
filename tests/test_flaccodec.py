"""FLAC decoder round-trips against an INDEPENDENT test-side encoder
(the JPEG/VP8L proof discipline: tests/test_imagecodec.py).

The encoder here is written from the FLAC format spec with its own
bit writer and table-driven CRCs (the decoder derives CRCs bitwise),
covering: verbatim / constant / fixed(0-4) / LPC subframes, RICE and
RICE2 partitions (orders 0-2) plus the escaped raw form, wasted bits,
all four stereo decorrelation modes, explicit and fixed blocksize
codes, streaminfo-coded and explicit sample rates, 8- and 16-bit
sample sizes.
"""

from __future__ import annotations

import math
import random
import struct

import pytest

from data_pipeline_childcare_spark.sources.flaccodec import (
    decode_flac,
    parse_streaminfo,
)


# ----------------------------------------------------------------- encoder
class _W:
    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ws(self, value: int, n: int) -> None:
        self.w(value & ((1 << n) - 1), n)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _crc8_table():
    tbl = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _crc16_table():
    tbl = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_C8, _C16 = _crc8_table(), _crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _C8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = (_C16[((c >> 8) ^ b) & 0xFF] ^ (c << 8)) & 0xFFFF
    return c


def _utf8_number(w: _W, v: int) -> None:
    if v < 0x80:
        w.w(v, 8)
        return
    # shortest multi-byte form: n continuation bytes carry 6n bits,
    # the lead byte carries (6 - n) bits
    for n in range(1, 7):
        if v.bit_length() <= 6 * n + (6 - n):
            break
    lead = (0xFF << (7 - n)) & 0xFF
    w.w(lead | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        w.w(0x80 | ((v >> (6 * i)) & 0x3F), 8)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else (-(v << 1) - 1)


def _write_residual(w: _W, resid: list[int], order: int, blocksize: int,
                    part_order: int = 0, rice2: bool = False,
                    force_escape: bool = False) -> None:
    param_bits = 5 if rice2 else 4
    escape = (1 << param_bits) - 1
    # spec: the partition count must divide the blocksize (a short
    # final frame caps the usable order)
    while blocksize % (1 << part_order) or (blocksize >> part_order) <= order:
        part_order -= 1
    w.w(1 if rice2 else 0, 2)
    w.w(part_order, 4)
    per = blocksize >> part_order
    idx = 0
    for p in range(1 << part_order):
        count = per - order if p == 0 else per
        chunk = resid[idx : idx + count]
        idx += count
        maxz = max((_zigzag(r) for r in chunk), default=0)
        param = max(0, maxz.bit_length() - 4)
        if force_escape or param >= escape:
            raw = max((r.bit_length() + 1 for r in chunk), default=1)
            raw = min(raw, 31)
            w.w(escape, param_bits)
            w.w(raw, 5)
            for r in chunk:
                w.ws(r, raw)
        else:
            w.w(param, param_bits)
            for r in chunk:
                u = _zigzag(r)
                q = u >> param
                for _ in range(q):
                    w.w(0, 1)
                w.w(1, 1)
                w.w(u & ((1 << param) - 1), param)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(w: _W, samples: list[int], bps: int, kind: str,
                    order: int = 2, wasted: int = 0, part_order: int = 0,
                    rice2: bool = False, force_escape: bool = False,
                    lpc_coefs: list[int] | None = None, lpc_shift: int = 5) -> None:
    if kind in ("fixed", "lpc"):
        o = len(lpc_coefs or [26, -12]) if kind == "lpc" else order
        if len(samples) <= o:  # short final frame: predictor can't warm up
            kind = "verbatim"
    w.w(0, 1)  # pad
    eff = bps - wasted
    if wasted:
        s = [x >> wasted for x in samples]
        assert all((x << wasted) == orig for x, orig in zip(s, samples)), "wasted-bit samples must have low zero bits"
    else:
        s = samples
    blocksize = len(s)
    if kind == "constant":
        assert len(set(s)) == 1
        w.w(0, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.w(0, 1)
            w.w(1, 1)
        w.ws(s[0], eff)
    elif kind == "verbatim":
        w.w(1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.w(0, 1)
            w.w(1, 1)
        for x in s:
            w.ws(x, eff)
    elif kind == "fixed":
        w.w(0x08 + order, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.w(0, 1)
            w.w(1, 1)
        for x in s[:order]:
            w.ws(x, eff)
        coefs = _FIXED[order]
        resid = []
        for t in range(order, blocksize):
            pred = sum(c * s[t - 1 - i] for i, c in enumerate(coefs))
            resid.append(s[t] - pred)
        _write_residual(w, resid, order, blocksize, part_order, rice2, force_escape)
    elif kind == "lpc":
        coefs = lpc_coefs or [26, -12]
        order = len(coefs)
        w.w(0x20 + order - 1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            for _ in range(wasted - 1):
                w.w(0, 1)
            w.w(1, 1)
        for x in s[:order]:
            w.ws(x, eff)
        prec = max(c.bit_length() + 1 for c in coefs)
        prec = max(2, min(prec, 15))
        w.w(prec - 1, 4)
        w.ws(lpc_shift, 5)
        for c in coefs:
            w.ws(c, prec)
        resid = []
        for t in range(order, blocksize):
            acc = sum(c * s[t - 1 - i] for i, c in enumerate(coefs))
            resid.append(s[t] - (acc >> lpc_shift))
        _write_residual(w, resid, order, blocksize, part_order, rice2, force_escape)
    else:
        raise AssertionError(kind)


def encode_flac(
    channels: list[list[int]],
    rate: int = 16000,
    bps: int = 16,
    blocksize: int = 256,
    mode: str = "independent",   # independent | left_side | right_side | mid_side
    kind: str = "verbatim",
    rate_code: str = "streaminfo",  # streaminfo | explicit
    **sub_kw,
) -> bytes:
    n_ch = len(channels)
    total = len(channels[0])
    # STREAMINFO
    si = _W()
    si.w(blocksize, 16)
    si.w(blocksize, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(n_ch - 1, 3)
    si.w(bps - 1, 5)
    si.w(total, 36)
    si.align()
    body = si.bytes() + b"\x00" * 16  # md5 unchecked by the decoder
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        w = _W()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed blocking strategy → frame number
        w.w(0x6 if n <= 256 else 0x7, 4)          # explicit 8/16-bit blocksize
        w.w(0x0 if rate_code == "streaminfo" else 0xD, 4)
        sub = [ch[pos : pos + n] for ch in channels]
        if mode == "independent":
            w.w(n_ch - 1, 4)
        elif mode == "left_side":
            w.w(0x8, 4)
        elif mode == "right_side":
            w.w(0x9, 4)
        elif mode == "mid_side":
            w.w(0xA, 4)
        else:
            raise AssertionError(mode)
        w.w({8: 0x1, 12: 0x2, 16: 0x4, 20: 0x5, 24: 0x6}[bps], 3)
        w.w(0, 1)
        _utf8_number(w, frame_idx)
        if n <= 256:
            w.w(n - 1, 8)
        else:
            w.w(n - 1, 16)
        if rate_code == "explicit":
            w.w(rate, 16)
        w.align()
        header = w.bytes()
        header += bytes([crc8(header)])
        fw = _W()
        if mode == "independent":
            for ch in sub:
                _write_subframe(fw, ch, bps, kind, **sub_kw)
        else:
            left, right = sub
            side = [l - r for l, r in zip(left, right)]
            if mode == "left_side":
                _write_subframe(fw, left, bps, kind, **sub_kw)
                _write_subframe(fw, side, bps + 1, kind, **sub_kw)
            elif mode == "right_side":
                _write_subframe(fw, side, bps + 1, kind, **sub_kw)
                _write_subframe(fw, right, bps, kind, **sub_kw)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(fw, mid, bps, kind, **sub_kw)
                _write_subframe(fw, side, bps + 1, kind, **sub_kw)
        fw.align()
        frame = header + fw.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        pos += n
        frame_idx += 1
    return bytes(out)


def _sine16(n: int, freq: float = 0.013, amp: int = 9000, phase: float = 0.0) -> list[int]:
    return [int(amp * math.sin(freq * i + phase)) for i in range(n)]


def _pcm16(channels: list[list[int]]) -> bytes:
    n_ch, n = len(channels), len(channels[0])
    buf = bytearray(2 * n * n_ch)
    k = 0
    for t in range(n):
        for c in range(n_ch):
            struct.pack_into("<h", buf, k, channels[c][t])
            k += 2
    return bytes(buf)


# ------------------------------------------------------------------- tests
def test_streaminfo_parse():
    ch = [_sine16(500)]
    blob = encode_flac(ch, rate=22050, blocksize=128)
    info = parse_streaminfo(blob)
    assert info["sample_rate"] == 22050
    assert info["channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == 500


def test_verbatim_mono_roundtrip():
    ch = [_sine16(700)]
    rate, n_ch, pcm = decode_flac(encode_flac(ch, blocksize=256))
    assert (rate, n_ch) == (16000, 1)
    assert pcm == _pcm16(ch)


def test_constant_and_multiframe_roundtrip():
    ch = [[-123] * 600]
    rate, n_ch, pcm = decode_flac(encode_flac(ch, kind="constant", blocksize=200))
    assert pcm == _pcm16(ch)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders_roundtrip(order):
    ch = [_sine16(512)]
    blob = encode_flac(ch, kind="fixed", order=order, blocksize=256)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16(ch)


@pytest.mark.parametrize("part_order,rice2", [(1, False), (2, True)])
def test_rice_partitions_and_rice2(part_order, rice2):
    ch = [_sine16(512, freq=0.21, amp=12000)]
    blob = encode_flac(
        ch, kind="fixed", order=2, blocksize=256,
        part_order=part_order, rice2=rice2,
    )
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16(ch)


def test_escaped_raw_partitions():
    rnd = random.Random(7)
    ch = [[rnd.randrange(-32768, 32768) for _ in range(300)]]
    blob = encode_flac(ch, kind="fixed", order=4, blocksize=128, force_escape=True)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16(ch)


def test_lpc_roundtrip():
    ch = [_sine16(512, amp=7000)]
    blob = encode_flac(ch, kind="lpc", blocksize=256,
                       lpc_coefs=[51, -22], lpc_shift=5)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16(ch)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation_modes(mode):
    left = _sine16(400, amp=8000)
    right = _sine16(400, amp=6000, phase=1.3)
    blob = encode_flac([left, right], mode=mode, kind="fixed", order=2, blocksize=200)
    rate, n_ch, pcm = decode_flac(blob)
    assert n_ch == 2
    assert pcm == _pcm16([left, right])


def test_wasted_bits_roundtrip():
    ch = [[v & ~0x7 for v in _sine16(256, amp=6000)]]  # 3 low zero bits
    blob = encode_flac(ch, kind="verbatim", blocksize=128, wasted=3)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16(ch)


def test_8bit_scales_to_pcm16():
    ch = [[(i % 200) - 100 for i in range(300)]]
    blob = encode_flac(ch, bps=8, kind="verbatim", blocksize=150)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16([[v << 8 for v in ch[0]]])


def test_24bit_downscales_to_pcm16():
    rnd = random.Random(11)
    ch = [[rnd.randrange(-(1 << 23), 1 << 23) for _ in range(300)]]
    blob = encode_flac(ch, bps=24, kind="verbatim", blocksize=128)
    _, _, pcm = decode_flac(blob)
    assert pcm == _pcm16([[v >> 8 for v in ch[0]]])


def test_explicit_rate_code():
    ch = [_sine16(256)]
    blob = encode_flac(ch, rate=11025, rate_code="explicit", blocksize=256)
    rate, _, pcm = decode_flac(blob)
    assert rate == 11025  # decoder reports STREAMINFO's rate
    assert pcm == _pcm16(ch)  # the explicit in-frame rate field parsed


def test_crc_corruption_raises():
    ch = [_sine16(300)]
    blob = bytearray(encode_flac(ch, blocksize=256))
    blob[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))
    blob2 = bytearray(encode_flac(ch, blocksize=256))
    # flip a bit inside the first frame's audio payload
    blob2[len(blob2) // 2] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob2))


def test_seeded_fuzz_roundtrips():
    rnd = random.Random(42)
    for it in range(25):
        n_ch = rnd.choice([1, 2])
        n = rnd.randrange(50, 900)
        amp = rnd.randrange(100, 16000)
        chans = [
            [int(amp * math.sin(0.002 * rnd.random() * 50 * i + c)) for i in range(n)]
            for c in range(n_ch)
        ]
        kind = rnd.choice(["verbatim", "fixed", "lpc"])
        kw = {}
        if kind == "fixed":
            kw = {"order": rnd.randrange(0, 5), "part_order": rnd.choice([0, 1]),
                  "rice2": rnd.random() < 0.5, "force_escape": rnd.random() < 0.3}
        if kind == "lpc":
            kw = {"lpc_coefs": [rnd.randrange(-60, 61) or 1
                                for _ in range(rnd.randrange(1, 5))],
                  "lpc_shift": rnd.randrange(0, 8)}
        mode = "independent" if n_ch == 1 else rnd.choice(
            ["independent", "left_side", "right_side", "mid_side"])
        bs = rnd.choice([64, 100, 256, 300])
        blob = encode_flac(chans, blocksize=bs, mode=mode, kind=kind, **kw)
        _, _, pcm = decode_flac(blob)
        assert pcm == _pcm16(chans), f"fuzz iteration {it} diverged"


def test_audio_features_real_tier_on_flac(spark):
    """audio_features must land FLAC in the REAL tier with features
    identical to the same PCM shipped as WAV."""
    from data_pipeline_childcare_spark.sources.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    left = _sine16(800, amp=9000)
    right = _sine16(800, amp=5000, phase=0.7)
    pcm = _pcm16([left, right])
    wav = encode_wav_pcm16(16000, 2, pcm)
    flac = encode_flac([left, right], rate=16000, mode="mid_side",
                       kind="fixed", order=2, blocksize=256)
    df = spark.createDataFrame(
        [("a.wav", bytearray(wav)), ("a.flac", bytearray(flac))],
        "path string, content binary",
    )
    rows = {r["path"]: r for r in audio_features(df).collect()}
    assert not rows["a.flac"]["is_stub"] and not rows["a.wav"]["is_stub"]
    for col in ("sample_rate", "channels", "n_samples", "duration_ms",
                "rms", "peak", "zcr"):
        assert rows["a.flac"][col] == rows["a.wav"][col], col
