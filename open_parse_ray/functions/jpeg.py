"""Baseline JPEG codec — stdlib + numpy only (no PIL in this env).

Closes the reference's DCTDecode image path
(/root/reference/src/openparse/text/pdfminer/core.py:70-96 maps
DCTDecode streams to image/jpeg and hands the bytes to PIL): here the
bytes are decoded for real — marker parse, Huffman entropy decode,
dequantize, IDCT, chroma upsample, YCbCr→RGB — and a matching encoder
produces the test vectors (ITU-T T.81 baseline sequential, Annex K
tables; 4:4:4, 4:2:2 and 4:2:0; restart intervals; 8-bit precision).

JPEG is lossy, so the gates are tolerance roundtrips (quality 95 on
smooth images stays within a few code values), an orthonormality check
on the DCT pair, byte-determinism of the encoder, and strict-advance
fuzz (corrupt bytes raise, never hang). Progressive (SOF2) and
arithmetic coding are rejected with a clear error.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- tables

# Annex K quantization tables (natural order)
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan: _ZIGZAG[i] = (row, col) of the i-th coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K Huffman specs: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = x[:, None]
    d = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    d[0, :] *= np.sqrt(0.5)
    return d * 0.5  # orthonormal


_D = _dct_matrix()


def _canonical_codes(bits, values):
    """(code, length) per symbol in canonical Huffman order."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class JpegError(ValueError):
    pass


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s

    def restart_marker(self, n: int):
        self.flush()
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    coef = _D @ block @ _D.T
    quant = np.rint(coef / qtab).astype(np.int64)
    zz = quant.ravel()[_ZIGZAG]
    diff = int(zz[0]) - pred
    size = _category(diff)
    c, ln = dc_codes[size]
    bw.write(c, ln)
    if size:
        bw.write(_extend_bits(diff, size), size)
    run = 0
    for v in zz[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        size = _category(v)
        c, ln = ac_codes[(run << 4) | size]
        bw.write(c, ln)
        bw.write(_extend_bits(v, size), size)
        run = 0
    if run:
        c, ln = ac_codes[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


def _pad_to(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % bh, -w % bw_
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _dht_segment(tc_th: int, spec) -> bytes:
    bits, values = spec
    body = bytes([tc_th]) + bytes(bits) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF bytes for a uint8 (H, W, 3) RGB or (H, W) gray
    image. ``subsampling``: '444', '422' or '420' (color only);
    ``restart_interval``: emit DRI + RSTn every N MCUs (0 = none)."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise JpegError("encode_jpeg expects uint8")
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise JpegError("expects (H,W,3) RGB or (H,W) gray")
    if subsampling not in ("444", "422", "420"):
        raise JpegError("subsampling must be '444', '422' or '420'")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("empty image")

    ql = _scale_qtable(_Q_LUMA, quality)
    qc = _scale_qtable(_Q_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qmap = [0]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling in ("420", "422"):
            fy = 2 if subsampling == "420" else 1  # vertical chroma factor
            ph, pw = -h % fy, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // fy, fy, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // fy, fy, cr.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, fy), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qmap = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        # each plane padded so the MCU grid tiles it exactly
        padded.append(_pad_to(p, 8 * sv, 8 * sh))
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for i, (p, (sh, sv)) in enumerate(zip(padded, samp)):
        need_h, need_w = mcus_y * 8 * sv, mcus_x * 8 * sh
        if p.shape[0] < need_h or p.shape[1] < need_w:
            padded[i] = np.pad(
                p, ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])), mode="edge"
            )

    dc_l = _canonical_codes(*_HUFF_DC_LUMA)
    ac_l = _canonical_codes(*_HUFF_AC_LUMA)
    dc_c = _canonical_codes(*_HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*_HUFF_AC_CHROMA)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql), (1, qc)) if not gray else ((0, ql),):
        body = bytes([tid]) + bytes(int(q.ravel()[_ZIGZAG][i]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qmap[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _HUFF_DC_LUMA)
    out += _dht_segment(0x10, _HUFF_AC_LUMA)
    if not gray:
        out += _dht_segment(0x01, _HUFF_DC_CHROMA)
        out += _dht_segment(0x11, _HUFF_AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    preds = [0] * ncomp
    qtabs = [ql if qmap[ci] == 0 else qc for ci in range(ncomp)]
    huffs = [(dc_l, ac_l) if ci == 0 else (dc_c, ac_c) for ci in range(ncomp)]
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart_marker(mcu_count // restart_interval - 1)
                preds = [0] * ncomp
            mcu_count += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        block = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                        preds[ci] = _encode_block(
                            bw, block, qtabs[ci], huffs[ci][0], huffs[ci][1], preds[ci]
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise JpegError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise JpegError("truncated after 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn consumed by caller via sync()
                self.marker = nxt
                raise JpegError("hit RST marker mid-symbol")
            else:
                self.marker = nxt
                raise JpegError("hit marker mid-symbol")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Discard padding bits and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("missing restart marker")


def _decode_huffman_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _build_decode_table(bits, values) -> dict:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg(payload: bytes) -> np.ndarray:
    """uint8 (H, W, 3) RGB (or (H, W) for single-component streams)."""
    d = payload
    if len(d) < 4 or d[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(d):
            raise JpegError("truncated before SOS")
        if d[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise JpegError("EOI before scan")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seg_len = struct.unpack(">H", d[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > len(d):
            raise JpegError("bad segment length")
        body = d[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                b += 1
                n = 64 * (2 if pq else 1)
                if b + n > len(body):
                    raise JpegError("bad DQT")
                raw = (
                    np.frombuffer(body[b : b + n], dtype=">u2")
                    if pq
                    else np.frombuffer(body[b : b + n], dtype=np.uint8)
                ).astype(np.int32)
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = raw
                qtables[tq] = tab.reshape(8, 8)
                b += n
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc_th = body[b]
                b += 1
                if b + 16 > len(body):
                    raise JpegError("bad DHT")
                bits = list(body[b : b + 16])
                b += 16
                n = sum(bits)
                if b + n > len(body):
                    raise JpegError("bad DHT values")
                values = list(body[b : b + n])
                b += n
                htables[tc_th] = _build_decode_table(bits, values)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            fh, fw = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if any(c["h"] == 0 or c["v"] == 0 for c in comps):
                raise JpegError("bad sampling factor")
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            break
        # else: APPn/COM skipped
    if frame is None:
        raise JpegError("missing SOF before SOS")

    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = []
    for s in scan:
        c = by_id.get(s["cs"])
        if c is None:
            raise JpegError("scan references unknown component")
        order.append((c, s))
    planes = {
        c["id"]: np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in comps
    }

    br = _BitReader(d, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                preds = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c, s in order:
                dc_tab = htables.get(0x00 | s["td"])
                ac_tab = htables.get(0x10 | s["ta"])
                q = qtables.get(c["tq"])
                if dc_tab is None or ac_tab is None or q is None:
                    raise JpegError("missing table for scan")
                for byy in range(c["v"]):
                    for bxx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huffman_symbol(br, dc_tab)
                        diff = _extend(br.bits(size), size) if size else 0
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        kk = 1
                        while kk < 64:
                            sym = _decode_huffman_symbol(br, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run != 15:
                                    raise JpegError("bad AC symbol")
                                kk += 16
                                continue
                            kk += run
                            if kk >= 64:
                                raise JpegError("AC coefficient overflow")
                            zz[kk] = _extend(br.bits(sz), sz)
                            kk += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * q.ravel()[_ZIGZAG]
                        block = _D.T @ coef.reshape(8, 8) @ _D
                        r0 = (my * c["v"] + byy) * 8
                        c0 = (mx * c["h"] + bxx) * 8
                        planes[c["id"]][r0 : r0 + 8, c0 : c0 + 8] = block

    out_planes = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        # upsample to full MCU-grid resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:fh, :fw])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise JpegError(f"unsupported component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
