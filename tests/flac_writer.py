"""Minimal pure-Python FLAC *encoder* — test fixture for the native decoder.

Produces spec-valid FLAC streams exercising every decoder path: CONSTANT /
VERBATIM / FIXED / LPC subframes, Rice and escape-coded residual
partitions (any partition order), wasted bits, all four channel
assignments, and the block-size / sample-size header codes.  Lossless by
construction, so tests assert exact sample round-trips.

Not a production encoder (no model search, no MD5); kept in tests/ on
purpose.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self._acc = (self._acc << bits) | value
        self._nbits += bits
        while self._nbits >= 8:
            self._nbits -= 8
            self.bytes.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for follow, lead in ((1, 0xC0), (2, 0xE0), (3, 0xF0), (4, 0xF8),
                         (5, 0xFC), (6, 0xFE)):
        if n < (1 << (5 * follow + 6)) or follow == 6:
            payload = [(n >> (6 * i)) & 0x3F for i in range(follow)][::-1]
            lead_bits = n >> (6 * follow)
            return bytes([lead | lead_bits] + [0x80 | p for p in payload])
    raise ValueError(n)


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(object)
    return np.where(v >= 0, 2 * v, -2 * v - 1)


def _write_residual(bw: BitWriter, res: np.ndarray, blocksize: int,
                    order: int, partition_order: int = 0,
                    escape: bool = False) -> None:
    bw.write(0, 2)                      # method: 4-bit Rice
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    psize = blocksize >> partition_order
    idx = 0
    for p in range(nparts):
        count = psize - (order if p == 0 else 0)
        part = res[idx: idx + count]
        idx += count
        if escape:
            width = int(max(int(np.abs(part).max(initial=0)).bit_length() + 1,
                            2))
            bw.write(0xF, 4)            # escape code
            bw.write(width, 5)
            for v in part:
                bw.write_signed(int(v), width)
        else:
            u = _zigzag(part)
            mean = int(np.mean(u)) if len(u) else 0
            k = max(mean.bit_length() - 1, 0)
            k = min(k, 14)
            bw.write(k, 4)
            for uv in u:
                uv = int(uv)
                bw.write_unary(uv >> k)
                bw.write(uv & ((1 << k) - 1), k)


FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(bw: BitWriter, samples: np.ndarray, bps: int,
                    kind: str = "fixed", order: int = 2,
                    wasted: int = 0, partition_order: int = 0,
                    escape: bool = False,
                    lpc_coeffs: list[int] | None = None,
                    lpc_shift: int = 10, lpc_precision: int = 12) -> None:
    samples = samples.astype(np.int64)
    if wasted:
        assert (samples & ((1 << wasted) - 1) == 0).all()
        samples = samples >> wasted
        bps -= wasted
    type_bits = {"constant": 0, "verbatim": 1}.get(kind)
    if kind == "fixed":
        type_bits = 0b001000 | order
    elif kind == "lpc":
        order = len(lpc_coeffs)
        type_bits = 0b100000 | (order - 1)
    bw.write(0, 1)                      # reserved
    bw.write(type_bits, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)

    n = len(samples)
    if kind == "constant":
        assert (samples == samples[0]).all()
        bw.write_signed(int(samples[0]), bps)
    elif kind == "verbatim":
        for v in samples:
            bw.write_signed(int(v), bps)
    elif kind == "fixed":
        for v in samples[:order]:
            bw.write_signed(int(v), bps)
        coef = FIXED_COEFFS[order]
        res = np.array([
            int(samples[i]) - sum(c * int(samples[i - 1 - j])
                                  for j, c in enumerate(coef))
            for i in range(order, n)
        ], dtype=object)
        _write_residual(bw, res, n, order, partition_order, escape)
    elif kind == "lpc":
        for v in samples[:order]:
            bw.write_signed(int(v), bps)
        bw.write(lpc_precision - 1, 4)
        bw.write_signed(lpc_shift, 5)
        for c in lpc_coeffs:
            bw.write_signed(int(c), lpc_precision)
        res = np.array([
            int(samples[i])
            - (sum(int(c) * int(samples[i - 1 - j])
                   for j, c in enumerate(lpc_coeffs)) >> lpc_shift)
            for i in range(order, n)
        ], dtype=object)
        _write_residual(bw, res, n, order, partition_order, escape)
    else:
        raise ValueError(kind)


_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}


def write_frame(frame_no: int, channels: list[np.ndarray], bps: int,
                channel_assignment: int, ss_from_streaminfo: bool = True,
                **subframe_kw) -> bytes:
    """One frame. `channels` holds the already-decorrelated subframe
    signals (e.g. [left, side] for assignment 8)."""
    blocksize = len(channels[0])
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)     # sync
    hdr.write(0, 1)                     # reserved
    hdr.write(0, 1)                     # fixed blocksize stream
    bs_code = _BLOCKSIZE_CODES.get(blocksize, 7)
    hdr.write(bs_code, 4)
    hdr.write(0, 4)                     # sample rate: from STREAMINFO
    hdr.write(channel_assignment, 4)
    ss_code = 0 if ss_from_streaminfo else {8: 1, 12: 2, 16: 4, 20: 5,
                                            24: 6, 32: 7}[bps]
    hdr.write(ss_code, 3)
    hdr.write(0, 1)                     # reserved
    for b in _utf8_number(frame_no):
        hdr.write(b, 8)
    if bs_code == 7:
        hdr.write(blocksize - 1, 16)
    hdr.align()
    hbytes = hdr.getvalue()
    body = BitWriter()
    for b in hbytes:
        body.write(b, 8)
    body.write(crc8(hbytes), 8)
    for c, sig in enumerate(channels):
        sub_bps = bps
        if (channel_assignment == 8 and c == 1) or \
           (channel_assignment == 9 and c == 0) or \
           (channel_assignment == 10 and c == 1):
            sub_bps += 1
        _write_subframe(body, sig, sub_bps, **subframe_kw)
    body.align()
    frame = body.getvalue()
    out = BitWriter()
    for b in frame:
        out.write(b, 8)
    out.write(crc16(frame), 16)
    return out.getvalue()


def write_streaminfo(blocksize: int, sample_rate: int, channels: int,
                     bps: int, total_samples: int) -> bytes:
    bw = BitWriter()
    bw.write(1, 1)                      # last metadata block
    bw.write(0, 7)                      # STREAMINFO
    bw.write(34, 24)
    bw.write(blocksize, 16)             # min blocksize
    bw.write(blocksize, 16)             # max blocksize
    bw.write(0, 24)                     # min framesize unknown
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(channels - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total_samples, 36)
    for _ in range(16):
        bw.write(0, 8)                  # MD5 unset
    return bw.getvalue()


def encode_flac(signal: np.ndarray, sample_rate: int = 16000,
                bps: int = 16, blocksize: int = 4096,
                channel_assignment: int | None = None,
                report_total: bool = True, **subframe_kw) -> bytes:
    """Encode [n] mono or [n, 2] stereo integer samples -> FLAC bytes."""
    signal = np.asarray(signal, np.int64)
    if signal.ndim == 1:
        signal = signal[:, None]
    n, nch = signal.shape
    if channel_assignment is None:
        channel_assignment = 0 if nch == 1 else 1
    out = bytearray(b"fLaC")
    out += write_streaminfo(blocksize, sample_rate, nch, bps,
                            n if report_total else 0)
    for f, start in enumerate(range(0, n, blocksize)):
        blk = signal[start: start + blocksize]
        if nch == 1:
            chans = [blk[:, 0]]
        elif channel_assignment == 1:
            chans = [blk[:, 0], blk[:, 1]]
        elif channel_assignment == 8:    # left/side
            chans = [blk[:, 0], blk[:, 0] - blk[:, 1]]
        elif channel_assignment == 9:    # side/right
            chans = [blk[:, 0] - blk[:, 1], blk[:, 1]]
        elif channel_assignment == 10:   # mid/side
            chans = [(blk[:, 0] + blk[:, 1]) >> 1, blk[:, 0] - blk[:, 1]]
        else:
            raise ValueError(channel_assignment)
        out += write_frame(f, chans, bps, channel_assignment, **subframe_kw)
    return bytes(out)
