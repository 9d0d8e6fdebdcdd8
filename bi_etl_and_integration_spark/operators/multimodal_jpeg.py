"""Pure numpy/stdlib baseline JPEG codec (ITU-T T.81 sequential DCT).

Closes the multimodal block's JPEG gap without Pillow: a full
baseline-sequential decoder (SOF0 — Huffman tables and quant tables
read from the stream, 4:4:4 / 4:2:2 / 4:2:0 / grayscale, restart
markers, byte stuffing) and a matching encoder (quality-scaled Annex-K
quant tables, per-image canonical Huffman tables emitted in DHT, 4:4:4
or 4:2:0).  Progressive (SOF2), arithmetic coding, 12-bit precision
and hierarchical modes raise ``NotImplementedError`` so callers keep
routing those payloads to the quarantine stream — the honest-boundary
contract ``multimodal._decode_image_bytes`` documents.

Reference semantics source: the public JPEG spec (ITU-T T.81 / ISO
10918-1) — Annex F (sequential codec flow), Annex K (example quant
matrices, BITS-adjustment for ≤16-bit Huffman lengths).  The encoder
derives Huffman tables from each image's own symbol frequencies
instead of transcribing the 162-entry Annex-K example tables: any
spec-compliant table set round-trips (decoders read DHT from the
stream), and generated tables cannot carry a silent transcription
typo that self-consistent encode/decode tests would never catch.

Perf: per-image cost, Arrow-batched by the mapInPandas operators that
call it; the IDCT/FDCT are vectorized over all blocks at once (one
``einsum`` per plane), the entropy loop is per-symbol Python — fine
for the feature-extraction batch shapes this targets, not a codec for
the hot path of a 100 TB image pipeline (that pipeline brings real
codec libs; the Spark-side plumbing is what this repo proves).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)

#: Annex K example quantization matrices (natural order)
_QL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)
_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)

_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])


def is_jpeg(payload: bytes) -> bool:
    return bool(payload) and payload[:2] == b"\xff\xd8"


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients -> (n, 8, 8) samples."""
    return np.einsum("ua,nuv,vb->nab", _C, blocks, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ua,nab,vb->nuv", _C, blocks, _C, optimize=True)


# ------------------------------------------------------------ decoder

class _BitReader:
    """MSB-first reader over de-stuffed entropy-coded bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the n-bit magnitude to its signed
    value (low half of the range encodes negatives)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _huff_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """(length, code) -> symbol, per the canonical code construction
    of T.81 C.2 (codes of each length are consecutive, doubling when
    the length increases)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_read(r: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to (h, w, 3) RGB uint8 (or
    (h, w, 1) for single-component grayscale).

    Raises ``ValueError`` on non-JPEG/corrupt input and
    ``NotImplementedError`` on non-baseline modes (progressive SOF2,
    arithmetic, 12-bit) — quarantine-routable, same contract as
    ``decode_png``.  Truncated/garbled streams surface as ValueError
    (never a raw struct/index error), so the quarantine split in the
    calling operators stays total."""
    try:
        return _decode_jpeg(payload)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as e:
        raise ValueError(f"corrupt JPEG stream: {type(e).__name__}") \
            from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None          # (h, w, comps) where comps = [(cid,hs,vs,tq)]
    scan_comps = None     # [(cid, td, ta)]
    restart = 0
    data = payload
    pos = 2
    scan_data = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1                      # 0xFF fill bytes are legal
        marker = data[pos + 1]
        if marker == 0xD8:          # stray SOI
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos = pos + 2 + seglen
        if marker == 0xDB:          # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(body[i:i + 64], np.uint8)
                    i += 64
                else:
                    vals = np.frombuffer(body[i:i + 128], ">u2")
                    i += 128
                t = np.zeros(64)
                t[_ZIG] = vals
                qt[tq] = t.reshape(8, 8).astype(np.float64)
        elif marker == 0xC4:        # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                huffval = list(body[i + 17:i + 17 + n])
                tab = _huff_decode_table(bits, huffval)
                (huff_ac if tc else huff_dc)[th] = tab
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), \
                body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            if h == 0 or w == 0 or h * w > 268_435_456:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} out of range (corrupt "
                    f"SOF, or beyond the 256 MP in-memory decode cap)")
            comps = []
            for c in range(nc):
                cid, hv, tq_ = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq_))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG mode (SOF{marker - 0xC0}); "
                "baseline sequential (SOF0/1) only")
        elif marker == 0xDD:        # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:        # SOS
            ns = body[0]
            # a legal baseline stream MAY split components across
            # several scans (non-interleaved); this decoder reads one
            # interleaved scan only — quarantine the mode explicitly
            # instead of dying on a td/ta KeyError mid-entropy-decode
            if frame is not None and ns < len(frame[2]):
                raise NotImplementedError(
                    f"non-interleaved baseline scan ({ns} of "
                    f"{len(frame[2])} components in first SOS); "
                    "single interleaved scan only")
            scan_comps = []
            for c in range(ns):
                cid, tdta = body[1 + 2 * c:3 + 2 * c]
                scan_comps.append((cid, tdta >> 4, tdta & 0xF))
            scan_data = data[pos:]
            break
        # APPn/COM/others: skipped
    if frame is None or scan_data is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame

    # split the entropy stream on RST/EOI markers, de-stuffing FF00
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan_data):
        b = scan_data[i]
        if b == 0xFF:
            m = scan_data[i + 1] if i + 1 < len(scan_data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:       # RSTn: new segment
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                        # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu

    # per-component block grids (in MCU-padded dimensions)
    grids = {}
    for cid, hs, vs, tq_ in comps:
        bw, bh = mcux * hs, mcuy * vs
        grids[cid] = np.zeros((bh * bw, 8, 8), dtype=np.float64)
    td_ta = {cid: (td, ta) for cid, td, ta in scan_comps}

    mcu = 0
    for seg in segments:
        if mcu >= n_mcu:
            break
        r = _BitReader(seg)
        pred = {cid: 0 for cid, *_ in comps}
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for cid, hs, vs, tq_ in comps:
                dctab = huff_dc[td_ta[cid][0]]
                actab = huff_ac[td_ta[cid][1]]
                q = qt[tq_]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64)
                        t = _huff_read(r, dctab)
                        diff = _extend(r.receive(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, actab)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break           # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            zz[k] = _extend(r.receive(ss), ss)
                            k += 1
                        blk = np.zeros(64)
                        blk[_ZIG] = zz
                        row = my * vs + by
                        col = mx * hs + bx
                        grids[cid][row * (mcux * hs) + col] = (
                            blk.reshape(8, 8) * q)
            mcu += 1
    if mcu < n_mcu:
        raise ValueError(f"JPEG truncated: {mcu}/{n_mcu} MCUs decoded")

    planes = {}
    for cid, hs, vs, tq_ in comps:
        bw = mcux * hs
        bh = mcuy * vs
        sam = _idct_blocks(grids[cid]) + 128.0
        # (bh*bw, 8, 8) -> (bh*8, bw*8)
        plane = (sam.reshape(bh, bw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        # upsample to full resolution then crop
        plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs,
                                                        axis=1)
        planes[cid] = plane[:h, :w]
    if len(comps) == 1:
        g = np.clip(planes[comps[0][0]].round(), 0, 255).astype(np.uint8)
        return g[:, :, None]
    y, cb, cr = (planes[c[0]] for c in comps[:3])
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# ------------------------------------------------------------ encoder

def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int],
                                                  dict[int, tuple[int, int]]]:
    """Length-limited (≤16) canonical Huffman per T.81 K.2-style
    adjustment; reserves the all-ones code via a dummy symbol the way
    the spec's example procedure does."""
    freq = dict(freq)
    freq[256] = 1                     # dummy: keeps all-ones unused
    # standard two-array merge (codesize/others), T.81 K.2 Figure K.1
    codesize = {s: 0 for s in freq}
    others = {s: None for s in freq}
    f = dict(freq)
    while True:
        live = [s for s, v in f.items() if v > 0]
        if len(live) <= 1:
            break
        live.sort(key=lambda s: (f[s], s))
        v1, v2 = live[0], live[1]
        f[v1] += f[v2]
        f[v2] = 0
        while True:
            codesize[v1] += 1
            if others[v1] is None:
                break
            v1 = others[v1]
        others[v1] = v2
        while True:
            codesize[v2] += 1
            if others[v2] is None:
                break
            v2 = others[v2]
    # size the length histogram from the actual max code length — a
    # pathologically skewed symbol distribution (huge image, near-
    # degenerate frequencies) can exceed 32 bits, and a fixed 33-slot
    # array would die in an unwrapped IndexError here
    max_len = max(codesize.values(), default=0)
    bits = [0] * (max(max_len, 32) + 1)
    for s, ln in codesize.items():
        if ln:
            bits[ln] += 1
    # adjust lengths > 16 (T.81 Figure K.3), starting at the longest
    # length actually produced
    for ln in range(len(bits) - 1, 16, -1):
        while bits[ln] > 0:
            j = ln - 2
            while bits[j] == 0:
                j -= 1
            bits[ln] -= 2
            bits[ln - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    # drop the dummy symbol from the longest used length
    for ln in range(16, 0, -1):
        if bits[ln] > 0:
            bits[ln] -= 1
            break
    # canonical assignment: symbols sorted by (codesize, value)
    syms = sorted((s for s in codesize if codesize[s] and s != 256),
                  key=lambda s: (codesize[s], s))
    bits16 = bits[1:17]
    huffval: list[int] = []
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits16[ln - 1]):
            s = syms[k]
            codes[s] = (code, ln)
            huffval.append(s)
            code += 1
            k += 1
        code <<= 1
    return bits16, huffval, codes


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)          # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)   # 1-padding per spec


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(100, max(1, int(quality)))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    ql = np.clip(np.floor((_QL * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    return ql, qc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 -> (n, 8, 8) raster order."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    return (plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
            .reshape(bh * bw, 8, 8))


def _encode_component_symbols(qblocks: np.ndarray):
    """Per block: (dc_size, dc_bits) and AC (run,size) symbol list —
    one pass used for both frequency counting and emission."""
    out = []
    pred = 0
    for blk in qblocks:
        zz = blk.reshape(64)[_ZIG]       # natural order -> zigzag
        dc = int(zz[0])
        diff = dc - pred
        pred = dc
        mag = abs(diff)
        size = int(mag).bit_length()
        dcval = diff if diff >= 0 else diff + (1 << size) - 1
        acs = []
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))       # ZRL
                run -= 16
            s = abs(v).bit_length()
            val = v if v >= 0 else v + (1 << s) - 1
            acs.append(((run << 4) | s, val, s))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))           # EOB
        out.append((size, dcval, acs))
    return out


def encode_jpeg(img: np.ndarray, *, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Encode (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 to
    baseline JFIF JPEG: quality-scaled Annex-K quant tables, 4:4:4
    (or 4:2:0 with ``subsample=True``), canonical per-image Huffman
    tables emitted in DHT."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg: 1 or 3 channels")
    ql, qc = _quant_tables(quality)
    f = img.astype(np.float64)
    if nch == 3:
        r_, g_, b_ = f[..., 0], f[..., 1], f[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        planes = [y, cb, cr]
    else:
        planes = [f[..., 0]]
    sub = 2 if (subsample and nch == 3) else 1
    mcu = 8 * sub

    def pad(p, m):
        ph = -(-p.shape[0] // m) * m
        pw = -(-p.shape[1] // m) * m
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    comp_q = []
    for ci, p in enumerate(planes):
        if ci == 0:
            p = pad(p, mcu)
            q = ql
        else:
            p = pad(p, mcu)
            if sub == 2:           # 2x2 mean chroma downsample
                p = p.reshape(p.shape[0] // 2, 2,
                              p.shape[1] // 2, 2).mean(axis=(1, 3))
            q = qc
        coef = _fdct_blocks(_plane_blocks(p - 128.0))
        comp_q.append(np.round(coef / q).astype(np.int64).astype(
            np.float64))

    # Reorder blocks into EMISSION (MCU) order before computing DC
    # diffs — the predictor chain follows the bitstream order, which
    # for 4:2:0 interleaves the four Y blocks of each MCU, not the
    # raster order _plane_blocks produces.
    if nch == 3 and sub == 2:
        ph_, pw_ = pad(planes[0], mcu).shape
        yh, yw = ph_ // 8, pw_ // 8
        mcuy, mcux = yh // 2, yw // 2
        yorder = np.array([(my * 2 + by) * yw + (mx * 2 + bx)
                           for my in range(mcuy) for mx in range(mcux)
                           for by in range(2) for bx in range(2)])
        comp_q[0] = comp_q[0][yorder]
        mcu_pattern = [0, 0, 0, 0, 1, 2]   # 4 Y, then Cb, Cr per MCU
    else:
        mcu_pattern = list(range(nch))
    syms = [_encode_component_symbols(cq) for cq in comp_q]
    dcf_l, acf_l = {}, {}
    dcf_c, acf_c = {}, {}
    for ci, comp in enumerate(syms):
        dcf, acf = (dcf_l, acf_l) if ci == 0 else (dcf_c, acf_c)
        for size, _dcv, acs in comp:
            dcf[size] = dcf.get(size, 0) + 1
            for rs, _v, _s in acs:
                acf[rs] = acf.get(rs, 0) + 1
    tables = [("dc", 0, *_build_huffman(dcf_l)),
              ("ac", 0, *_build_huffman(acf_l))]
    if nch == 3:
        tables += [("dc", 1, *_build_huffman(dcf_c)),
                   ("ac", 1, *_build_huffman(acf_c))]
    codes = {(kind, tid): c for kind, tid, _b, _v, c in tables}

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, q in ((0, ql),) + (((1, qc),) if nch == 3 else ()):
        zz = q.reshape(64)[_ZIG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + zz.tobytes()
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nch) \
        + bytes([8]) + struct.pack(">HH", h, w) + bytes([nch])
    for ci in range(nch):
        hs = vs = (sub if ci == 0 else 1) if nch == 3 else 1
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    for kind, tid, bits, huffval, _c in tables:
        tc = 0 if kind == "dc" else 1
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(huffval)) + bytes([(tc << 4) | tid]) \
            + bytes(bits) + bytes(huffval)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nch) + bytes([nch])
    for ci in range(nch):
        tid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tid << 4) | tid])
    out += bytes([0, 63, 0])

    wtr = _BitWriter()
    n_mcus = len(syms[0]) // mcu_pattern.count(0)
    idx = [0] * nch
    for _ in range(n_mcus):
        for ci in mcu_pattern:
            tid = 0 if ci == 0 else 1
            size, dcv, acs = syms[ci][idx[ci]]
            idx[ci] += 1
            code, ln = codes[("dc", tid)][size]
            wtr.write(code, ln)
            if size:
                wtr.write(dcv, size)
            for rs, v, s in acs:
                code, ln = codes[("ac", tid)][rs]
                wtr.write(code, ln)
                if s:
                    wtr.write(v, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"                                  # EOI
    return bytes(out)
