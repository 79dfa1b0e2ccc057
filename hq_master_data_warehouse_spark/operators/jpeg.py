"""Pure-Python baseline JPEG codec (decode + minimal encode).

Implements the public JPEG standard (ITU-T T.81) baseline sequential
process from first principles: DQT/DHT/SOF0/SOS/DRI marker parsing,
canonical Huffman decoding with 0xFF byte-unstuffing, differential DC
+ run-length AC entropy coding, dequantization, zigzag, 8x8 type-II
DCT via a numpy orthonormal-matrix product, nearest-neighbor chroma
upsampling for subsampled scans, and the JFIF YCbCr<->RGB transform.
The encoder exists for fixtures and egress: Annex K example
quantization/Huffman tables (the public spec's own tables), 4:4:4 or
4:2:0 sampling.

Engine context: this closes the last documented-out image format in
`operators/multimodal.py` -- decode_image now handles PPM, BMP, PNG,
and baseline JPEG with zero external codec dependencies.  Progressive
and arithmetic-coded JPEGs remain out (rare in training corpora and
explicitly rejected with a clear error).

Everything here is deterministic AND integer-exact (r11): the DCT /
IDCT run on a 2^14-scaled integer basis (the JPEG-hardware
quantization, same trick as multimodal_phash_neardup's fixed-point
DCT), the color transforms on 2^16-scaled integer coefficients, and
every rounding is an explicit half-away integer shift.  Fixed-point
is the PRODUCTION formulation -- libjpeg and every hardware codec
decode with scaled-integer DCTs (ITU-T T.83 conformance explicitly
budgets for it) -- and it makes the decoded pixels a pure integer
function of the bitstream: the same payload yields identical pixels
on any host, and a relational engine can replay the entire
encode->decode pipeline (minus the Huffman layer, which is a lossless
inverse pair and cancels) to cross-check the decoded stats
value-for-value.
"""

from __future__ import annotations

import struct

import numpy as np

# -- zigzag scan order (spec figure A.6) -----------------------------
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZIG = np.argsort(ZIGZAG)

# -- Annex K example tables (public spec) ----------------------------
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K Huffman specs: (BITS counts per length 1..16, HUFFVAL)
DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROM_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: block = C @ pixels @ C.T."""
    c = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c[k, n] = np.cos((2 * n + 1) * k * np.pi / 16)
    c *= 0.5
    c[0, :] *= 1 / np.sqrt(2)
    return c


# -- fixed-point constants (r11) --------------------------------------
#: DCT basis scale: 2^14, the JPEG-hardware quantization (identical to
#: multimodal_phash_neardup's fixed-point DCT basis).
FP_DCT_SHIFT = 14
#: integer DCT-II basis, |values| <= 8192*sqrt(2) < 2^14
CS_FP = np.rint(_dct_matrix() * (1 << FP_DCT_SHIFT)).astype(np.int64)
#: color-transform coefficient scale: 2^16 (the BT.601 integer form).
FP_CCOEF_SHIFT = 16
_CS16 = 1 << FP_CCOEF_SHIFT
#: RGB -> YCbCr rows (JFIF), scaled by 2^16
FP_Y = (round(0.299 * _CS16), round(0.587 * _CS16), round(0.114 * _CS16))
FP_CB = (
    round(-0.168736 * _CS16),
    round(-0.331264 * _CS16),
    round(0.5 * _CS16),
)
FP_CR = (
    round(0.5 * _CS16),
    round(-0.418688 * _CS16),
    round(-0.081312 * _CS16),
)
#: YCbCr -> RGB coefficients, scaled by 2^16
FP_R_CR = round(1.402 * _CS16)
FP_G_CB = round(-0.344136 * _CS16)
FP_G_CR = round(-0.714136 * _CS16)
FP_B_CB = round(1.772 * _CS16)
#: decoded plane working scale: 2^12 fractional bits per sample
FP_PLANE_SHIFT = 12


def _rdiv(v, shift: int):
    """Round-half-away-from-zero division by 2^shift on ints/arrays
    (the single rounding primitive of the fixed-point pipeline; Python
    ``>>`` floors on negatives, so the shift runs on |v|)."""
    h = 1 << (shift - 1)
    return np.sign(v) * ((np.abs(v) + h) >> shift)


# -- canonical Huffman ------------------------------------------------
def _build_codes(spec) -> dict:
    """(symbol -> (code, length)) from a (BITS, HUFFVAL) spec."""
    bits, vals = spec
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(spec) -> dict:
    """((length, code) -> symbol) lookup for bit-serial decoding."""
    return {
        (ln, code): sym for sym, (code, ln) in _build_codes(spec).items()
    }


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(self.pos)
            else:
                # EOI or other marker: pad with 1-bits (spec F.2.2.5)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.bits >> self.nbits) & 1
        # truncate consumed high bits: without this the accumulator
        # grows one Python-int limb per scan byte and every shift
        # becomes O(stream length) -- quadratic decode on real files
        self.bits &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.bits = 0
        self.nbits = 0
        self.pos += 2  # skip FF Dn


class _RestartMarker(Exception):
    def __init__(self, pos: int):
        self.pos = pos


def _decode_huffman(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (spec F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Baseline sequential JPEG -> {"width","height","mode","pixels"}.

    Supports 8-bit grayscale and 3-component YCbCr with sampling
    factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart intervals, and the
    JFIF color transform.  Progressive (SOF2) and arithmetic-coded
    scans raise NotImplementedError explicitly.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None
    width = height = 0
    restart_interval = 0
    while True:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("JPEG ended before scan data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(
                    seg[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.int32)
                qt[tq] = tbl
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1 : o + 17])
                n = sum(bits)
                vals = list(seg[o + 17 : o + 17 + n])
                table = _build_decoder((bits, vals))
                (huff_dc if tc == 0 else huff_ac)[th] = table
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            height, width = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/SOF1) supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cs)
                comp["td"], comp["ta"] = tdta >> 4, tdta & 0xF
                scan.append(comp)
            pos = pos + seg_len
            return _decode_scan(
                payload, pos, width, height, scan, qt, huff_dc,
                huff_ac, restart_interval,
            )
        # APPn / COM / others: skip
        pos += seg_len


def _decode_scan(
    data, pos, width, height, comps, qt, huff_dc, huff_ac, dri
) -> dict:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # planes hold fixed-point samples at scale 2^FP_PLANE_SHIFT
    planes = {
        c["id"]: np.zeros(
            (mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.int64
        )
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    reader = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                try:
                    # drain any residual bits until the marker shows
                    while True:
                        reader.read_bit()
                except _RestartMarker:
                    reader.align_restart()
                    pred = {c["id"]: 0 for c in comps}
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = _decode_block(
                            reader,
                            huff_dc[c["td"]],
                            huff_ac[c["ta"]],
                            qt[c["tq"]],
                            pred,
                            c["id"],
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    # upsample to full geometry, crop, color-transform -- all in
    # fixed-point: samples at scale 2^FP_PLANE_SHIFT, color
    # coefficients at 2^FP_CCOEF_SHIFT, one half-away shift per pixel
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:height, :width])
    half = 128 << FP_PLANE_SHIFT
    if len(out) == 1:
        pix = np.clip(
            _rdiv(out[0] + half, FP_PLANE_SHIFT), 0, 255
        ).astype(np.uint8)
        return {
            "width": width, "height": height, "mode": "L",
            "pixels": pix.tobytes(),
        }
    y, cb, cr = out[0] + half, out[1], out[2]
    ys = y << FP_CCOEF_SHIFT
    r = ys + FP_R_CR * cr
    g = ys + FP_G_CB * cb + FP_G_CR * cr
    b = ys + FP_B_CB * cb
    shift = FP_PLANE_SHIFT + FP_CCOEF_SHIFT
    rgb = np.stack(
        [
            np.clip(_rdiv(ch, shift), 0, 255)
            for ch in (r, g, b)
        ],
        axis=-1,
    ).astype(np.uint8)
    return {
        "width": width, "height": height, "mode": "RGB",
        "pixels": rgb.tobytes(),
    }


def _decode_block(reader, dc_tbl, ac_tbl, quant, pred, cid):
    zz = np.zeros(64, dtype=np.int32)
    t = _decode_huffman(reader, dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    zz[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _decode_huffman(reader, ac_tbl)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    coef = (zz * quant)[_UNZIG].reshape(8, 8).astype(np.int64)
    # integer IDCT at scale 2^(2*FP_DCT_SHIFT), reduced to the plane
    # working scale with ONE half-away shift
    s = CS_FP.T @ coef @ CS_FP
    return _rdiv(s, 2 * FP_DCT_SHIFT - FP_PLANE_SHIFT)


# -- minimal encoder (fixtures + egress) ------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(
    pixels: bytes, width: int, height: int, subsample: bool = False
) -> bytes:
    """Encode RGB24 pixels as a baseline JFIF JPEG with the Annex K
    example tables -- 4:4:4 by default, 4:2:0 with ``subsample``.
    Built for fixture generation and the egress path; quality is
    fixed by the spec tables (~Q50)."""
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, 3
    ).astype(np.int64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    # fixed-point YCbCr at scale 2^FP_CCOEF_SHIFT, level shift folded
    # into the scaled luma (128 is exact at any scale)
    y = (
        FP_Y[0] * r + FP_Y[1] * g + FP_Y[2] * b
        - (128 << FP_CCOEF_SHIFT)
    )
    cb = FP_CB[0] * r + FP_CB[1] * g + FP_CB[2] * b
    cr = FP_CR[0] * r + FP_CR[1] * g + FP_CR[2] * b
    hv = 2 if subsample else 1
    mcux = (width + 8 * hv - 1) // (8 * hv)
    mcuy = (height + 8 * hv - 1) // (8 * hv)

    def pad(p, fy, fx):
        th, tw = mcuy * 8 * fy, mcux * 8 * fx
        out = np.zeros((th, tw), dtype=np.int64)
        out[: p.shape[0], : p.shape[1]] = p
        # edge-replicate padding avoids ringing at the borders
        if p.shape[0] < th:
            out[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        if p.shape[1] < tw:
            out[:, p.shape[1]:] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    if subsample:
        # 2x2 mean downsample of chroma (half-away integer mean)
        ph = (height + 1) & ~1
        pw = (width + 1) & ~1

        def down(p):
            pp = np.zeros((ph, pw), dtype=np.int64)
            pp[:height, :width] = p
            if height < ph:
                pp[height:, :width] = p[-1:, :]
            if width < pw:
                pp[:, width:] = pp[:, width - 1 : width]
            return _rdiv(
                pp[0::2, 0::2] + pp[1::2, 0::2]
                + pp[0::2, 1::2] + pp[1::2, 1::2],
                2,
            )
        comps = [
            (1, pad(y, 2, 2), QUANT_LUM, hv, hv),
            (2, pad(down(cb), 1, 1), QUANT_CHROM, 1, 1),
            (3, pad(down(cr), 1, 1), QUANT_CHROM, 1, 1),
        ]
    else:
        comps = [
            (1, pad(y, 1, 1), QUANT_LUM, 1, 1),
            (2, pad(cb, 1, 1), QUANT_CHROM, 1, 1),
            (3, pad(cr, 1, 1), QUANT_CHROM, 1, 1),
        ]

    dc_codes = [_build_codes(DC_LUM_SPEC), _build_codes(DC_CHROM_SPEC)]
    ac_codes = [_build_codes(AC_LUM_SPEC), _build_codes(AC_CHROM_SPEC)]
    writer = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}
    for my in range(mcuy):
        for mx in range(mcux):
            for cid, plane, quant, ch, cv in comps:
                tbl = 0 if cid == 1 else 1
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        # integer forward DCT at scale
                        # 2^(FP_CCOEF_SHIFT + 2*FP_DCT_SHIFT);
                        # quantization divides by q at that scale in
                        # one exact half-away integer division
                        t = CS_FP @ block @ CS_FP.T
                        denom = quant.reshape(8, 8).astype(
                            np.int64
                        ) << (FP_CCOEF_SHIFT + 2 * FP_DCT_SHIFT)
                        q = (
                            np.sign(t)
                            * ((2 * np.abs(t) + denom) // (2 * denom))
                        ).astype(np.int32)
                        zz = q.reshape(-1)[ZIGZAG]
                        _encode_block(
                            writer, zz, pred, cid,
                            dc_codes[tbl], ac_codes[tbl],
                        )
    writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(body) + 2
        ) + body

    def dht(tc, th, spec):
        bits, vals = spec
        return seg(
            0xC4,
            bytes([tc << 4 | th]) + bytes(bits) + bytes(vals),
        )

    head = b"\xff\xd8"
    head += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += seg(0xDB, bytes([0]) + bytes(QUANT_LUM[ZIGZAG].tolist()))
    head += seg(0xDB, bytes([1]) + bytes(QUANT_CHROM[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, hv << 4 | hv, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    head += seg(0xC0, sof)
    head += dht(0, 0, DC_LUM_SPEC) + dht(1, 0, AC_LUM_SPEC)
    head += dht(0, 1, DC_CHROM_SPEC) + dht(1, 1, AC_CHROM_SPEC)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    head += seg(0xDA, sos)
    return head + bytes(writer.out) + b"\xff\xd9"


def _encode_block(writer, zz, pred, cid, dc_codes, ac_codes):
    diff = int(zz[0]) - pred[cid]
    pred[cid] = int(zz[0])
    t = _category(diff)
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(_magnitude_bits(diff, t), t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[run << 4 | s]
        writer.write(code, ln)
        writer.write(_magnitude_bits(v, s), s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
