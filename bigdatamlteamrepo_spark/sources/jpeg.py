"""Baseline JPEG (ITU-T T.81) encoder/decoder in pure numpy.

The last multimodal decode gap that isn't an environment gate: PPM,
PNG, WAV, and the MP4 container are already real (sources/codecs.py);
this module closes JPEG pixels.  Scope — the baseline sequential DCT
process with the spec's own reference data:

  * 4:4:4 sampling (one 8x8 block per component per MCU), 8-bit;
  * quantization: Annex-K example tables scaled by the widely-published
    libjpeg quality formula;
  * entropy coding: the Annex-K typical Huffman tables (the ones every
    baseline encoder ships), DPCM DC + (run, size) RLE AC, 0xFF byte
    stuffing, proper EOB/ZRL;
  * color: BT.601 full-range YCbCr exactly as in JFIF.

Decode parses real markers (SOI/APP/DQT/SOF0/DHT/SOS/EOI) and accepts
any baseline 4:4:4 stream with 8-bit precision — tables are read from
the STREAM, not assumed, so spec-derived hand-built fixtures validate
the parser independently of our encoder (tests/test_jpeg.py).

JPEG is lossy: round-trips are validated by PSNR and by exactness
cases the spec makes exact (solid blocks whose DC quantizes without
remainder).  Like everything in sources/codecs.py these are plain
bytes→numpy→bytes functions called from Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Reference tables (ITU-T T.81 Annex K — the spec's example data)
# ---------------------------------------------------------------------------

#: K.1 luminance quantization table (zigzag NOT applied; natural order)
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

#: K.2 chrominance quantization table
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: K.3 typical Huffman tables: (BITS counts per code length 1..16, VALUES)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    return order


ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in ZIGZAG])
_ZZ_COLS = np.array([c for _, c in ZIGZAG])

#: orthonormal 8-point DCT-II matrix
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d[0, :] *= 1 / np.sqrt(2)
    return d * 0.5


_DCT = _dct_matrix()


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """The widely-published libjpeg quality scaling: 50 = tables as-is,
    100 = all ones (near-lossless), 1 = coarsest."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1-100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (table * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Color transforms (JFIF / BT.601 full range)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Bit I/O + Huffman
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                # stuffed zero follows a data 0xFF; a marker ends data
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
                else:
                    self.pos -= 1  # marker: stop feeding, pad with zeros
                    self.acc = (self.acc << 8)
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        self._fill()
        if self.n < length:  # trailing pad
            self.acc <<= length - self.n
            self.n = length
        out = (self.acc >> (self.n - length)) & ((1 << length) - 1)
        self.n -= length
        self.acc &= (1 << self.n) - 1
        return out

    def restart(self) -> None:
        """Consume an RSTn marker at an MCU boundary: discard pad bits,
        byte-align, and step over the two marker bytes (T.81 E.1.4)."""
        self.acc = 0
        self.n = 0
        while self.pos < len(self.data) and self.data[self.pos] != 0xFF:
            self.pos += 1  # stray pad bytes before the marker
        if (
            self.pos + 1 < len(self.data)
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RSTn marker at restart interval")


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
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


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
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


def _decode_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _magnitude(value: int) -> tuple[int, int]:
    """value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if value == 0:
        return 0, 0
    size = int(abs(value)).bit_length()
    bits = value if value >= 0 else value + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """amplitude bits -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _blocks(channel: np.ndarray) -> np.ndarray:
    """HxW (padded to 8s by edge clamp) -> (n_blocks, 8, 8) row-major."""
    h, w = channel.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(channel, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(
    rgb: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """HxWx3 uint8 -> baseline sequential JFIF bytes (4:4:4).

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that-many MCUs (DC predictors reset, stream byte-aligned) —
    the error-resilience device real encoders use on large images."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError(f"expected HxWx3 uint8, got {rgb.shape} {rgb.dtype}")
    h, w = rgb.shape[:2]
    qt = [_quality_scale(QT_LUMA, quality), _quality_scale(QT_CHROMA, quality)]
    ycc = _rgb_to_ycbcr(rgb)
    comp_blocks = []
    for c in range(3):
        blocks = _blocks(ycc[..., c]) - 128.0
        coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        q = qt[0] if c == 0 else qt[1]
        quant = np.round(coef / q).astype(np.int32)
        comp_blocks.append(quant[:, _ZZ_ROWS, _ZZ_COLS])  # (n, 64) zigzag

    dc_codes = [_build_codes(*HT_DC_LUMA), _build_codes(*HT_DC_CHROMA)]
    ac_codes = [_build_codes(*HT_AC_LUMA), _build_codes(*HT_AC_CHROMA)]
    writer = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = comp_blocks[0].shape[0]
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()
            writer.out += bytes(
                [0xFF, 0xD0 + ((m // restart_interval - 1) % 8)]
            )
            pred = [0, 0, 0]
        for c in range(3):
            t = 0 if c == 0 else 1
            zz = comp_blocks[c][m]
            diff = int(zz[0]) - pred[c]
            pred[c] = int(zz[0])
            size, bits = _magnitude(diff)
            code, length = dc_codes[t][size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
            last_nz = 63
            while last_nz > 0 and zz[last_nz] == 0:
                last_nz -= 1
            for k in range(1, last_nz + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[t][0xF0]  # ZRL
                    writer.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_codes[t][(run << 4) | size]
                writer.write(code, length)
                writer.write(bits, size)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[t][0x00]  # EOB
                writer.write(code, length)
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, 2 + len(payload)) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(cls: int, tid: int, bits: list[int], values: list[int]) -> bytes:
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        )

    sof = seg(
        0xFFC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, 0x11, 0])  # Y: id 1, 1x1 sampling, qtable 0
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(
        0xFFDA,
        bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]),
    )
    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xFFDD, struct.pack(">H", restart_interval))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt[0])
        + dqt(1, qt[1])
        + sof
        + dht(0, 0, *HT_DC_LUMA)
        + dht(1, 0, *HT_AC_LUMA)
        + dht(0, 1, *HT_DC_CHROMA)
        + dht(1, 1, *HT_AC_CHROMA)
        + dri
        + sos
        + bytes(writer.out)
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential 4:4:4 JFIF bytes -> HxWx3 uint8.

    Tables (DQT/DHT) and frame geometry are read from the stream —
    nothing is assumed from our encoder — so hand-built spec fixtures
    exercise the parser independently."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comps = []  # (comp_id, qtab_id)
    scan = []  # (comp_index, dc_tid, ac_tid)
    i = 2
    data_start = None
    restart_interval = 0
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip to the marker byte proper
        j = i + 1
        while j < len(payload) and payload[j] == 0xFF:
            j += 1
        marker = payload[j]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / stray RSTn: standalone markers with no length field
            i = j + 1
            continue
        i = j - 1  # normalize so segment arithmetic below is unchanged
        (length,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tid = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                flat = np.frombuffer(body, np.uint8, 64, j + 1).astype(np.int32)
                tbl = np.zeros((8, 8), np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = flat
                qt[tid] = tbl
                j += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                values = list(body[j + 17 : j + 17 + n])
                huff[(cls, tid)] = _build_decoder(bits, values)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            for c in range(n_comp):
                cid, sampling, qtid = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    raise ValueError("only 4:4:4 (1x1 sampling) supported")
                comps.append((cid, qtid))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            n_scan = body[0]
            for c in range(n_scan):
                cid, tids = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    k for k, (ccid, _) in enumerate(comps) if ccid == cid
                )
                scan.append((idx, tids >> 4, tids & 0xF))
            data_start = i + 2 + length
            break
        i += 2 + length
    if h is None or data_start is None:
        raise ValueError("JPEG missing SOF0/SOS")

    reader = _BitReader(payload[data_start:])
    n_bx, n_by = -(-w // 8), -(-h // 8)
    n_mcu = n_bx * n_by
    out_ch = []
    coef = np.zeros((len(scan), n_mcu, 8, 8), dtype=np.float64)
    pred = [0] * len(scan)
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart()
            pred = [0] * len(scan)
        for s, (cidx, dc_tid, ac_tid) in enumerate(scan):
            zz = np.zeros(64, dtype=np.int32)
            size = _decode_symbol(reader, huff[(0, dc_tid)])
            pred[s] += _extend(reader.read(size), size)
            zz[0] = pred[s]
            k = 1
            while k <= 63:
                sym = _decode_symbol(reader, huff[(1, ac_tid)])
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(reader.read(size), size)
                k += 1
            block = np.zeros((8, 8), dtype=np.int32)
            block[_ZZ_ROWS, _ZZ_COLS] = zz
            coef[s, m] = block * qt[comps[cidx][1]]
    for s in range(len(scan)):
        pix = np.einsum("ij,nik,kl->njl", _DCT, coef[s], _DCT) + 128.0
        ph, pw = n_by * 8, n_bx * 8
        img = (
            pix.reshape(n_by, n_bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph, pw)
        )
        out_ch.append(img[:h, :w])
    if len(out_ch) == 1:
        y = np.clip(np.round(out_ch[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    return _ycbcr_to_rgb(np.stack(out_ch, axis=-1))
