"""Minimal spec-conformant FLAC encoder — TEST FIXTURE ONLY.

Produces real FLAC streams (valid STREAMINFO, frame headers with CRC-8,
frame CRC-16, UTF-8 frame numbers) so the native decoder in
``csrc/flac.cpp`` can be round-trip tested without any external flac
tooling.  Supports verbatim and fixed-order-2 subframes with single-
partition Rice residuals, and 1-2 independent channels.  Lossless: decoded
samples must equal the int input exactly.
"""

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)   # q zeros then a 1

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self):
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n):
    if n < 0x80:
        return bytes([n])
    nbytes = 2
    while n.bit_length() > 1 + 5 * nbytes:  # payload capacity: 1+5*nbytes
        nbytes += 1
    out = []
    shift = 6 * (nbytes - 1)
    first_payload_bits = 7 - nbytes
    out.append(((0xFF << (8 - nbytes)) & 0xFF)
               | ((n >> shift) & ((1 << first_payload_bits) - 1)))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_encode(bw, residual, k):
    for v in residual:
        v = int(v)
        u = (2 * -v - 1) if v < 0 else 2 * v   # zigzag
        bw.write_unary(u >> k)
        if k:
            bw.write(u & ((1 << k) - 1), k)


def _subframe(bw, samples, bps, mode):
    if mode == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)          # type VERBATIM
        bw.write(0, 1)          # no wasted bits
        for s in samples:
            bw.write(int(s), bps)
        return
    assert mode == "fixed2"
    order = 2
    bw.write(0, 1)
    bw.write(0x08 | order, 6)   # type FIXED, order 2
    bw.write(0, 1)
    s = np.asarray(samples, np.int64)
    for w in s[:order]:
        bw.write(int(w), bps)
    res = s[order:] - (2 * s[1:-1] - s[:-2])
    # single-partition Rice residual; pick k from the mean magnitude
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    k = max(0, min(14, int(np.ceil(np.log2(mean + 1)))))
    bw.write(0, 2)              # residual method: RICE (4-bit params)
    bw.write(0, 4)              # partition order 0
    bw.write(k, 4)
    _rice_encode(bw, res, k)


def encode_flac(x, sr, bps=16, blocksize=1024, mode="fixed2",
                write_total=True):
    """x: int array (n,) mono or (n, 2) stereo -> FLAC stream bytes.

    ``write_total=False`` leaves the STREAMINFO total-samples field 0
    ("unknown"), which real encoders emit for live/piped streams."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n, nch = x.shape
    assert nch in (1, 2)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n if write_total else 0, 36)
    si_body = si.getvalue() + b"\x00" * 16       # dummy MD5
    out += bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body

    for fi, start in enumerate(range(0, n, blocksize)):
        block = x[start:start + blocksize]
        bs = block.shape[0]
        head = BitWriter()
        head.write(0x3FFE, 14)   # sync
        head.write(0, 1)
        head.write(0, 1)         # fixed blocksize stream
        head.write(7, 4)         # blocksize: 16-bit follows
        head.write(0, 4)         # sample rate: from STREAMINFO
        head.write(nch - 1, 4)   # independent channels
        head.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        head.write(0, 1)
        hb = bytearray(head.getvalue() + _utf8_number(fi))
        bw2 = BitWriter()
        bw2.write(bs - 1, 16)
        hb += bw2.getvalue()
        hb.append(crc8(hb))

        body = BitWriter()
        for c in range(nch):
            _subframe(body, block[:, c], bps,
                      mode if bs > 2 else "verbatim")
        body.align()
        frame = bytes(hb) + body.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
