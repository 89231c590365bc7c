"""Pure-stdlib baseline JPEG codec (numpy DCT + Python Huffman).

Closes the last image-channel codec stub (NOTES r4 backlog #4): the
container has no PIL/libjpeg, but baseline sequential JPEG is a public
spec (ITU-T T.81 / JFIF) and decodes exactly with a bit reader, canonical
Huffman tables from DHT, and a vectorized 8x8 IDCT. Supported: baseline
DCT (SOF0), 8-bit, grayscale or YCbCr, sampling factors 1 or 2 per axis
(covers 4:4:4 / 4:2:2 / 4:2:0), restart markers. Progressive (SOF2),
arithmetic coding, 12-bit, and CMYK raise NotImplementedError -- callers
fall back to the deterministic digest feature, exactly like the PNG path
does for interlaced images.

The encoder exists to make the decoder testable without any codec library
in the container (same pattern as functions/wav.py / y4m.py): quality-
scaled Annex-K quantization tables, FDCT via one matrix product, and
uniform-length canonical Huffman tables (legal DHT content -- every table
the spec allows is declared in the file, and uniform lengths keep the
table literals out of the source). Roundtrip error is bounded by the
quantization step, which the tests assert.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

#: raster index of each zigzag position (ITU-T T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1/K.2 base quantization tables (zigzag order after reshape)
_QUANT_LUMA = np.array(
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
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
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
    dtype=np.int64,
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: FDCT(x) = C x C^T, IDCT(X) = C^T X C."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c / 2.0


_DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K base tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (0xFF -> 0xFF 0x00)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def pad(self) -> None:
        if self._nbits:
            # pad to a byte boundary with 1-bits (T.81 F.1.2.3)
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)

    def raw(self, marker: bytes) -> None:
        """Emit marker bytes verbatim (markers are never byte-stuffed)."""
        self.pad()
        self.buf += marker

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded bytes; un-stuffs 0xFF00."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read(self, n: int) -> int:
        while self._nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG marker in scan")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise ValueError("unexpected marker inside entropy data")
            self._acc = (self._acc << 8) | byte
            self._nbits += 8
        self._nbits -= n
        out = (self._acc >> self._nbits) & ((1 << n) - 1)
        self._acc &= (1 << self._nbits) - 1
        return out

    def align(self) -> None:
        self._acc = 0
        self._nbits = 0


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (counts per length 1..16, symbols in order) -> {symbol: (code, len)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[next(it)] = (code, length)
            code += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decoder from DHT data: per-length (min_code, max_code,
    first_symbol_index) arrays, one length step per bit (T.81 F.16)."""

    def __init__(self, counts: list[int], symbols: list[int]) -> None:
        self.symbols = symbols
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read(1)
            if self.max_code[length] >= 0 and code <= self.max_code[length]:
                if code >= self.min_code[length]:
                    return self.symbols[self.val_ptr[length] + code - self.min_code[length]]
        raise ValueError("invalid JPEG Huffman code")


def _uniform_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """All symbols at one code length -- legal DHT content as long as
    len(symbols) < 2**length (the all-ones code stays unassigned)."""
    if len(symbols) >= (1 << length):
        raise ValueError("uniform Huffman table overflow")
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return counts, symbols


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_TABLE = _uniform_table(_DC_SYMBOLS, 5)
_AC_TABLE = _uniform_table(_AC_SYMBOLS, 9)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, extra-bit pattern) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)


def _extend(r: int, s: int) -> int:
    return r - (1 << s) + 1 if r < (1 << (s - 1)) else r


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = 128.0 - 0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2]
    cr = 128.0 + 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2]
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) -> (n, 8, 8) raster-order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize every 8x8 block of a padded plane, vectorized."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coeffs = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    return np.round(coeffs / qt).astype(np.int64)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    """Edge-replicate pad to (h, w) -- replication keeps block AC energy low."""
    ph, pw = h - plane.shape[0], w - plane.shape[1]
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _write_block(
    bw: _BitWriter,
    coeffs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = coeffs.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    s, extra = _magnitude(dc - pred)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(extra, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s, extra = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(extra, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return dc


def _dht_segment(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
    counts, symbols = table
    body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, qt: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(qt.reshape(64)[i]) for i in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    px: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 1) grayscale / (H, W, 3) RGB uint8 -> baseline JFIF
    bytes. subsampling: "444" (1x1 chroma), "422" (2x1-box-mean chroma,
    16x8 MCUs -- exercises the decoder's asymmetric h!=v sampling path) or
    "420" (2x2-box-mean chroma, 16x16 interleaved MCUs).
    restart_interval > 0 writes DRI + RSTn markers every that-many MCUs
    (exercises the decoder's predictor-reset/realign path)."""
    px = np.asarray(px)
    if px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    gray = px.ndim == 2
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (H,W)[,1|3] image")
    _SUB = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsampling not in _SUB:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("zero-sized image")
    qt_l, qt_c = _quality_tables(quality)
    # luma sampling factors (horizontal, vertical) relative to chroma
    fx, fy = (1, 1) if gray else _SUB[subsampling]

    if gray:
        planes = [px.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if fx > 1 or fy > 1:
            for i in (1, 2):
                p = planes[i]
                ph = _pad_to(
                    p, -(-p.shape[0] // fy) * fy, -(-p.shape[1] // fx) * fx
                )
                planes[i] = (
                    ph.reshape(
                        ph.shape[0] // fy, fy, ph.shape[1] // fx, fx
                    ).mean(axis=(1, 3))
                )

    mcux, mcuy = -(-w // (8 * fx)), -(-h // (8 * fy))
    comp_blocks = []
    for ci, plane in enumerate(planes):
        cfx, cfy = (fx, fy) if ci == 0 else (1, 1)
        bh, bw_ = mcuy * cfy, mcux * cfx
        padded = _pad_to(plane, bh * 8, bw_ * 8)
        qt = qt_l if ci == 0 else qt_c
        blocks = _encode_plane_blocks(padded, qt).reshape(bh, bw_, 8, 8)
        comp_blocks.append(blocks)

    dc_codes = _canonical_codes(*_DC_TABLE)
    ac_codes = _canonical_codes(*_AC_TABLE)
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                rst = 0xD0 + ((mcu_i // restart_interval - 1) % 8)
                bw.raw(bytes([0xFF, rst]))
                preds = [0] * len(planes)
            mcu_i += 1
            for ci, blocks in enumerate(comp_blocks):
                cfx, cfy = (fx, fy) if ci == 0 else (1, 1)
                for vy in range(cfy):
                    for vx in range(cfx):
                        preds[ci] = _write_block(
                            bw,
                            blocks[my * cfy + vy, mx * cfx + vx],
                            preds[ci],
                            dc_codes,
                            ac_codes,
                        )
    scan = bw.flush()

    out = bytearray(JPEG_MAGIC)
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    out += _dqt_segment(0, qt_l)
    if not gray:
        out += _dqt_segment(1, qt_c)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        cfx, cfy = (fx, fy) if ci == 0 else (1, 1)
        sof += bytes([ci + 1, (cfx << 4) | cfy, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_TABLE)
    out += _dht_segment(1, 0, _AC_TABLE)
    if not gray:
        out += _dht_segment(0, 1, _DC_TABLE)
        out += _dht_segment(1, 1, _AC_TABLE)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, C) uint8 (C = 1 grayscale, 3 RGB).

    Raises ValueError for corrupt input, NotImplementedError for valid-but-
    unsupported variants (progressive SOF2, arithmetic coding, 12-bit,
    sampling factors > 2, 4-component CMYK)."""
    if not data.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    comps: list[_Component] = []
    height = width = 0
    restart_interval = 0
    scan_comps: list[_Component] = []
    scan_start = -1

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # TEM / RSTn: standalone markers, no length field
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.int64
                )
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = zz
                qtables[tq] = qt.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                counts = list(body[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(body[p + 17 : p + 17 + n])
                htables[(tc, th)] = _HuffDecoder(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            for i in range(ncomp):
                c = _Component()
                c.cid, hv, c.tq = body[6 + 3 * i : 9 + 3 * i]
                c.h, c.v = hv >> 4, hv & 0xF
                if c.h not in (1, 2) or c.v not in (1, 2):
                    raise NotImplementedError("sampling factors > 2")
                comps.append(c)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG (progressive/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                # non-interleaved multi-scan baseline: each component in
                # its own scan -- rare enough that silent zero planes
                # would be worse than the digest fallback
                raise NotImplementedError("multi-scan (non-interleaved) JPEG")
            for i in range(ns):
                cid, tt = body[1 + 2 * i : 3 + 2 * i]
                comp = next((c for c in comps if c.cid == cid), None)
                if comp is None:
                    raise ValueError("SOS references unknown component")
                comp.td, comp.ta = tt >> 4, tt & 0xF
                scan_comps.append(comp)
            scan_start = pos + seglen
            break
        # APPn / COM / others: skip
        pos += seglen

    if not comps or scan_start < 0 or height == 0 or width == 0:
        raise ValueError("missing SOF/SOS")

    # locate end of entropy data (next non-RST marker)
    p = scan_start
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] not in (0x00,) and not (
            0xD0 <= data[p + 1] <= 0xD7
        ):
            break
        p += 1 if data[p] != 0xFF else 2
    scan_bytes = data[scan_start:p]

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux, mcuy = -(-width // (8 * hmax)), -(-height // (8 * vmax))
    for c in comps:
        c.blocks = np.zeros((mcuy * c.v, mcux * c.h, 64), dtype=np.int64)

    br = _BitReader(scan_bytes)
    preds = {c.cid: 0 for c in comps}
    n_mcu = mcux * mcuy
    rst_pos = scan_start
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align and consume the RSTn marker embedded in the stream
            br.align()
            q = rst_pos + br.pos
            while q + 1 < len(data) and not (
                data[q] == 0xFF and 0xD0 <= data[q + 1] <= 0xD7
            ):
                q += 1
            br = _BitReader(data[q + 2 : p])
            rst_pos = q + 2
            preds = {c.cid: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in scan_comps:
            dc_t = htables.get((0, c.td))
            ac_t = htables.get((1, c.ta))
            if dc_t is None or ac_t is None:
                raise ValueError("scan references missing Huffman table")
            for vy in range(c.v):
                for vx in range(c.h):
                    zz = np.zeros(64, dtype=np.int64)
                    s = dc_t.decode(br)
                    diff = _extend(br.read(s), s) if s else 0
                    preds[c.cid] += diff
                    zz[0] = preds[c.cid]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        if rs == 0x00:
                            break
                        if rs == 0xF0:
                            k += 16
                            continue
                        run, size = rs >> 4, rs & 0xF
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        zz[k] = _extend(br.read(size), size)
                        k += 1
                    c.blocks[my * c.v + vy, mx * c.h + vx] = zz

    planes = []
    for c in comps:
        qt = qtables.get(c.tq)
        if qt is None:
            raise ValueError("component references missing quant table")
        bh, bw_ = c.blocks.shape[:2]
        coeffs = np.zeros((bh * bw_, 64), dtype=np.float64)
        coeffs[:, ZIGZAG] = c.blocks.reshape(-1, 64)
        coeffs = coeffs.reshape(-1, 8, 8) * qt
        pix = np.einsum("ji,njk,kl->nil", _DCT, coeffs, _DCT) + 128.0
        plane = (
            pix.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        # upsample to the full-resolution grid by pixel replication
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
