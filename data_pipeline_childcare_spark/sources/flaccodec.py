"""Library-free FLAC decoder → 16-bit PCM.

Speech/audio training corpora overwhelmingly ship FLAC
(LibriSpeech-class datasets), and FLAC is a fully documented lossless
format — so, per this repo's codec discipline (imagecodec.py: PNG,
GIF, baseline+progressive JPEG, VP8L), the decode tier is REAL code,
not a lib-gated stub: stdlib + bit twiddling only, verified by
round-trips against an INDEPENDENT test-side encoder
(tests/test_flaccodec.py) exactly like the JPEG/VP8L proofs.

Coverage: STREAMINFO parse; frames with all blocksize/sample-rate/
sample-size header codings; UTF-8 coded frame/sample numbers; CRC-8
header and CRC-16 frame verification; subframe types CONSTANT,
VERBATIM, FIXED (orders 0-4) and LPC (orders 1-32, quantized
coefficients with arithmetic-shift reconstruction); wasted-bits
shifts; RICE and RICE2 residual partitions including the escaped
raw-binary form; stereo decorrelation left/side, right/side and
mid/side. Sample sizes 8/12/16/20/24/32 bits (narrow depths scale up
to PCM16, wide studio-master depths scale down by arithmetic shift —
see decode_flac); other values raise so the caller's stub tier fires
loudly.

Spec: the public FLAC format documents (format.html / RFC 9639).
Reference parity: the reference pipeline has no audio decode at all —
this extends the multimodal surface the way 多数据源获取数据.py's
image handling was extended by imagecodec.py.
"""

from __future__ import annotations

import struct

__all__ = ["decode_flac", "parse_streaminfo", "encode_flac_pcm16"]


class _Bits:
    """Plain MSB-first bit reader (no byte stuffing — FLAC frames are
    raw). Tracks byte position for CRC windows."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("FLAC: truncated stream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def byte_pos(self) -> int:
        # only valid when byte-aligned
        return self.pos - self.nbits // 8


def _crc8(data: bytes) -> int:
    """CRC-8 poly 0x07, init 0 (FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly 0x8005, init 0 (FLAC whole-frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def parse_streaminfo(data: bytes) -> dict:
    """Parse the mandatory STREAMINFO block → dict with sample_rate,
    channels, bits_per_sample, total_samples, min/max blocksize."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        header = data[pos]
        last = bool(header & 0x80)
        btype = header & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length < 34:
                raise ValueError("FLAC: short STREAMINFO")
            min_bs, max_bs = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_blocksize": min_bs,
                "max_blocksize": max_bs,
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
                "frames_start": None,
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    info["frames_start"] = pos
    return info


_BLOCKSIZE_FIXED = {
    0x1: 192, 0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048, 0xC: 4096,
    0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_RATE_FIXED = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_SAMPLE_SIZE = {0x1: 8, 0x2: 12, 0x4: 16, 0x5: 20, 0x6: 24, 0x7: 32}
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_utf8_number(br: _Bits) -> int:
    """FLAC's extended UTF-8 coded frame/sample number (up to 36
    bits → ≤7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("FLAC: invalid UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: blocksize not divisible by partitions")
    out: list[int] = []
    per = blocksize >> part_order
    for p in range(n_parts):
        count = per - order if p == 0 else per
        if count < 0:
            raise ValueError("FLAC: predictor order exceeds first partition")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out.extend([0] * count)
            else:
                out.extend(br.read_signed(raw_bits) for _ in range(count))
        else:
            for _ in range(count):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if sftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif sftype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 0x08 <= sftype <= 0x0C:  # FIXED, order 0-4
        order = sftype - 0x08
        samples = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = 0
            for i, c in enumerate(coefs):
                pred += c * samples[-1 - i]
            samples.append(pred + r)
    elif sftype >= 0x20:  # LPC, order 1-32
        order = sftype - 0x20 + 1
        samples = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        for r in resid:
            acc = 0
            for i, c in enumerate(coefs):
                acc += c * samples[-1 - i]
            samples.append((acc >> shift) + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {sftype:#x}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(br: _Bits, info: dict) -> tuple[list[list[int]], int]:
    """One frame → (per-channel sample lists, sample_rate)."""
    start = br.byte_pos()
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("FLAC: lost frame sync")
    if br.read(1):
        raise ValueError("FLAC: reserved header bit set")
    br.read(1)  # blocking strategy (fixed/variable) — number below
    bs_code = br.read(4)
    rate_code = br.read(4)
    chan_code = br.read(4)
    size_code = br.read(3)
    if br.read(1):
        raise ValueError("FLAC: reserved header bit set")
    _read_utf8_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved blocksize code")
    if bs_code == 0x6:
        blocksize = br.read(8) + 1
    elif bs_code == 0x7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_FIXED[bs_code]
    if rate_code == 0:
        rate = info["sample_rate"]
    elif rate_code == 0xC:
        rate = br.read(8) * 1000
    elif rate_code == 0xD:
        rate = br.read(16)
    elif rate_code == 0xE:
        rate = br.read(16) * 10
    elif rate_code == 0xF:
        raise ValueError("FLAC: invalid sample-rate code")
    else:
        rate = _RATE_FIXED[rate_code]
    bps = info["bits_per_sample"] if size_code == 0 else _SAMPLE_SIZE.get(size_code)
    if bps is None:
        raise ValueError("FLAC: reserved sample-size code")
    header_end = br.byte_pos()
    if _crc8(br.data[start:header_end]) != br.read(8):
        raise ValueError("FLAC: frame header CRC mismatch")

    if chan_code <= 0x7:
        n_ch = chan_code + 1
        chans = [_read_subframe(br, blocksize, bps) for _ in range(n_ch)]
    elif chan_code == 0x8:  # left/side
        left = _read_subframe(br, blocksize, bps)
        side = _read_subframe(br, blocksize, bps + 1)
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif chan_code == 0x9:  # right/side
        side = _read_subframe(br, blocksize, bps + 1)
        right = _read_subframe(br, blocksize, bps)
        chans = [[r + s for r, s in zip(right, side)], right]
    elif chan_code == 0xA:  # mid/side
        mid = _read_subframe(br, blocksize, bps)
        side = _read_subframe(br, blocksize, bps + 1)
        left, right = [], []
        for m, s in zip(mid, side):
            m2 = (m << 1) | (s & 1)
            left.append((m2 + s) >> 1)
            right.append((m2 - s) >> 1)
        chans = [left, right]
    else:
        raise ValueError(f"FLAC: reserved channel assignment {chan_code:#x}")

    br.align()
    frame_end = br.byte_pos()
    crc = int.from_bytes(br.data[frame_end : frame_end + 2], "big")
    if _crc16(br.data[start:frame_end]) != crc:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    br.pos = frame_end + 2
    return chans, rate


def decode_flac(data: bytes) -> tuple[int, int, bytes]:
    """Decode a FLAC stream → (sample_rate, channels, pcm16_bytes),
    the same contract as multimodal._parse_wav_pcm so audio_features
    treats both containers identically. Narrow streams scale UP to 16
    bits (8/12-bit << shift); wide streams (20/24/32-bit studio
    masters) scale DOWN by arithmetic right shift — the standard
    lossy requantization, documented because the feature contract is
    PCM16."""
    info = parse_streaminfo(data)
    bps = info["bits_per_sample"]
    if bps not in (8, 12, 16, 20, 24, 32):
        raise ValueError(f"FLAC: unsupported bits_per_sample {bps}")
    n_ch = info["channels"]
    br = _Bits(data, info["frames_start"])
    total = info["total_samples"]  # 0 = unknown
    out: list[list[int]] = [[] for _ in range(n_ch)]
    got = 0
    while br.pos < len(data) and (total == 0 or got < total):
        chans, rate = _decode_frame(br, info)
        if len(chans) != n_ch:
            raise ValueError("FLAC: frame channel count != STREAMINFO")
        for i, ch in enumerate(chans):
            out[i].extend(ch)
        got += len(chans[0])
    if total and got > total:  # final frame may pad — trim to spec count
        out = [ch[:total] for ch in out]
        got = total
    shift = 16 - bps
    buf = bytearray(2 * got * n_ch)
    k = 0
    for t in range(got):
        for c in range(n_ch):
            v = out[c][t]
            v = (v << shift) if shift >= 0 else (v >> -shift)
            struct.pack_into("<h", buf, k, v)
            k += 2
    return info["sample_rate"], n_ch, bytes(buf)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def encode_flac_pcm16(rate: int, channels: int, pcm: bytes,
                      blocksize: int = 4096) -> bytes:
    """Fixture-grade FLAC writer (the audio sibling of
    ``multimodal.encode_wav_pcm16``): interleaved little-endian PCM16
    → a valid FLAC stream of VERBATIM subframes that
    :func:`decode_flac` round-trips losslessly, so pipeline tests and
    oracle queries can synthesize real FLAC with no media library.
    Verbatim-only by design — compression is not the fixture's job;
    correctness of the FRAME STRUCTURE (headers, CRCs, channel
    layout) is."""
    n_total = len(pcm) // (2 * channels)
    samples = [
        [struct.unpack_from("<h", pcm, 2 * (t * channels + c))[0] for t in range(n_total)]
        for c in range(channels)
    ]
    w = _BitWriter()
    # STREAMINFO (min/max blocksize, zero framesize bounds, zero MD5)
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(channels - 1, 3)
    w.write(16 - 1, 5)
    w.write(n_total, 36)
    body = bytes(w.buf) + b"\x00" * 16
    out = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    pos = 0
    while pos < n_total:
        n = min(blocksize, n_total - pos)
        h = _BitWriter()
        h.write(0x3FFE, 14)
        h.write(0, 2)                       # reserved + fixed blocking
        h.write(0x7, 4)                     # explicit 16-bit blocksize-1
        h.write(0x0, 4)                     # rate from STREAMINFO
        h.write(channels - 1, 4)            # independent channels
        h.write(0x4, 3)                     # 16-bit samples
        h.write(0, 1)
        # UTF-8 coded frame number (fixture streams stay < 2^31 frames)
        v = frame_idx
        if v < 0x80:
            h.write(v, 8)
        else:
            nb = 1
            while v.bit_length() > 6 * nb + (6 - nb):
                nb += 1
            h.write(((0xFF << (7 - nb)) & 0xFF) | (v >> (6 * nb)), 8)
            for i in range(nb - 1, -1, -1):
                h.write(0x80 | ((v >> (6 * i)) & 0x3F), 8)
        h.write(n - 1, 16)
        h.align()
        header = bytes(h.buf)
        header += bytes([_crc8(header)])
        f = _BitWriter()
        for c in range(channels):
            f.write(0, 1)
            f.write(1, 6)                   # VERBATIM
            f.write(0, 1)                   # no wasted bits
            for t in range(pos, pos + n):
                f.write(samples[c][t] & 0xFFFF, 16)
        f.align()
        frame = header + bytes(f.buf)
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += n
        frame_idx += 1
    return bytes(out)
