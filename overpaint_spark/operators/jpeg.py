"""Library-free JPEG codec: baseline + progressive decode, and a
minimal baseline encoder for round-trip tests.

Decoder scope — the two DCT processes that cover essentially all
real-world JPEG/JFIF files:

- SOF0 (baseline sequential, 8-bit), any component count 1–4, any
  integer sampling factors (4:4:4, 4:2:0, 4:2:2, ... — general Hi/Vi
  handling with nearest upsample);
- SOF2 (progressive): spectral selection AND successive approximation —
  interleaved or single-component DC scans, DC refinement bits,
  AC first scans with EOBn run coding, and AC refinement scans
  (the G.7 correction-bit algorithm);
- arbitrary Huffman tables from DHT (canonical bits/vals — not just the
  Annex K defaults), arbitrary 8-bit quant tables from DQT;
- restart intervals (DRI + RSTn: byte-align, marker check, DC/EOB-run
  reset);
- returns ``None`` for 12-bit, arithmetic-coded, lossless, or
  hierarchical streams — same honest-refusal contract as the PNG
  decoder in :mod:`overpaint_spark.operators.multimodal`.

Validation without an image library: round-trips against the encoder
below, plus real-world files shipped in this container — Spark's own
mllib test photos (baseline 4:2:0) and, crucially, the SAME photo in
both baseline color and progressive-with-refinement grayscale form,
whose two independent decode paths agree at correlation 0.999
(tests/test_jpeg.py).

The encoder exists so the decoder is testable in this container (no
image library exists here to produce fixtures): it emits spec-valid
baseline JFIF — 4:4:4 or 4:2:0, quality-scaled standard quant tables,
and per-image canonical Huffman tables built from the actual symbol
set (fixed-length canonical codes: valid, compact to construct, and it
exercises the decoder's general DHT machinery rather than hard-coded
defaults). Encode→decode round-trips are compared against the original
pixels within quantization-error bounds in tests/test_jpeg.py.

Per-coefficient entropy coding is pure Python — fixture-scale only, the
same trade the PNG unfiltering makes; the Spark-side plumbing
(mapInPandas batches of payloads) is identical when a native codec is
dropped in.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# Decode-side safety cap: a corrupted (or hostile) SOF can claim up to
# 65535×65535 and make the plane allocation tens of GB before a single
# coefficient is read — at pipeline scale that is an executor OOM, not
# an exception. 64 MP covers every sane still image.
MAX_PIXELS = 64_000_000

# zig-zag index order: ZIGZAG[k] = raster index of the k-th scanned coef
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IJG standard luminance/chrominance quant tables (Annex K), raster order
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# 8×8 DCT-II basis: _C[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_C = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# --------------------------------------------------------------------------
# Huffman tables
# --------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, from the DHT bits/vals canonical form."""
    table: dict[tuple[int, int], int] = {}
    code, vi = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (returns marker) at any real marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.buf):
            return False
        b = self.buf[self.pos]
        if b == 0xFF:
            # any run of 0xFF before a marker byte is fill padding
            # (T.81 B.1.1.2) — skip to the last 0xFF of the run
            while (
                self.pos + 1 < len(self.buf)
                and self.buf[self.pos + 1] == 0xFF
            ):
                self.pos += 1
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is None:
                return False
            else:
                self.marker = nxt  # real marker: stop here
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None

    def next_marker_pos(self) -> int | None:
        """Position of the next real marker's 0xFF (end-of-scan scan)."""
        if self.marker is not None:
            return self.pos
        p = self.pos
        while p + 1 < len(self.buf):
            if self.buf[p] == 0xFF and self.buf[p + 1] != 0x00:
                return p
            p += 1
        return None

    def align_and_expect_rst(self) -> bool:
        """Byte-align and consume an RSTn marker (restart-interval path)."""
        self.nbits = 0
        if self.marker is None:
            # marker byte not yet reached — scan forward to it,
            # treating 0xFF runs as fill padding before the marker byte
            while self.pos + 1 < len(self.buf):
                if (
                    self.buf[self.pos] == 0xFF
                    and self.buf[self.pos + 1] not in (0x00, 0xFF)
                ):
                    self.marker = self.buf[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None or not (0xD0 <= self.marker <= 0xD7):
            return False
        self.pos += 2
        self.marker = None
        return True


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes):
    """Baseline (SOF0) or progressive (SOF2) JPEG → H×W×C uint8
    (C = 1 gray or 3 RGB), or ``None`` when the stream is out of scope
    (12-bit, arithmetic-coded, lossless, hierarchical) or malformed.

    Refuse-never-throw contract: scraped corpora contain truncated and
    hostile payloads, and a raise here fails the whole Spark task, so
    segment payloads are length-checked before indexing and the body is
    additionally wrapped in a structural-error backstop."""
    try:
        return _decode_jpeg_checked(payload)
    except (IndexError, struct.error, ZeroDivisionError, ValueError):
        # Backstop only: the explicit validations below should make this
        # unreachable, but a corpus decoder must never let a crafted
        # stream escalate a parsing surprise into a task failure.
        return None


def _decode_jpeg_checked(payload: bytes):
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    state = None  # per-component natural-order coefficient grids (SOF2)
    restart_interval = 0
    pos = 2
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        # fill bytes: any number of 0xFF may precede a marker (B.1.1.2)
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            if progressive and state is not None:
                return _reconstruct_progressive(frame, state, qt)
            return None  # EOI before any (baseline) SOS
        if pos + 4 > n:
            return None
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if len(seg) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                if i + 65 > len(seg):  # truncated table
                    return None
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:  # 16-bit tables out of scope
                    return None
                tbl = np.zeros(64, dtype=np.int32)
                for k in range(64):
                    tbl[ZIGZAG[k]] = seg[i + 1 + k]
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:  # truncated frame header
                return None
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8 or h == 0 or w == 0 or not (1 <= nc <= 4):
                return None
            if h * w > MAX_PIXELS or len(seg) < 6 + 3 * nc:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if hi == 0 or vi == 0:  # spec minimum is 1; 0 would
                    return None  # divide-by-zero in _finish's ratios
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic/hierarchical
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None or len(seg) < 1:
                return None
            if len(seg) < 1 + 2 * seg[0] + 3:  # ns pairs + Ss/Se/AhAl
                return None
            if progressive:
                if state is None:
                    state = _alloc_progressive(frame)
                    if state is None:
                        return None
                nxt = _progressive_scan(
                    payload, pos + 2 + seglen, seg, frame, huff,
                    restart_interval, state,
                )
                if nxt is None:
                    return None
                pos = nxt
                continue
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((cc for cc in frame[2] if cc["id"] == cs), None)
                if comp is None:
                    return None
                scan.append((comp, tt >> 4, tt & 15))
            if ns != len(frame[2]):
                return None  # baseline multi-scan out of scope
            return _decode_scan(
                payload, pos + 2 + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += 2 + seglen
    return None


# --------------------------------------------------------------------------
# Progressive (SOF2) scan machinery
# --------------------------------------------------------------------------

def _frame_geometry(frame):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _alloc_progressive(frame):
    """Per-component natural-order coefficient grids, MCU-padded (the
    padding blocks are touched by interleaved DC scans)."""
    geo = _frame_geometry(frame)
    if geo is None:
        return None
    hmax, vmax, mcux, mcuy = geo
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame[2]
    ]


def _comp_block_grid(frame, c):
    """Non-interleaved block-grid dims for one component (spec A.2.2:
    ceil dims of the component's own sample grid, NOT MCU-padded)."""
    h, w, _ = frame
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _refine_nonzero(r, coef, zz_k, p1):
    """One correction bit for a nonzero-history coefficient (spec G.7 /
    the classic decode_mcu_AC_refine shape). Returns False on truncation."""
    b = r.read_bit()
    if b is None:
        return False
    if b and (int(coef[zz_k]) & p1) == 0:
        coef[zz_k] += p1 if coef[zz_k] >= 0 else -p1
    return True


def _ac_first_block(r, act, coef, ss, se, al, eob):
    if eob[0] > 0:
        eob[0] -= 1
        return True
    k = ss
    while k <= se:
        rs = r.decode_symbol(act)
        if rs is None:
            return False
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run != 15:
                eob[0] = (1 << run) - 1
                if run:
                    v = r.receive(run)
                    if v is None:
                        return False
                    eob[0] += v
                return True
            k += 16
            continue
        k += run
        if k > se:
            return False
        v = r.receive(size)
        if v is None:
            return False
        coef[ZIGZAG[k]] = _extend(v, size) << al
        k += 1
    return True


def _ac_refine_block(r, act, coef, ss, se, al, eob):
    p1 = 1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = r.decode_symbol(act)
            if rs is None:
                return False
            run, size = rs >> 4, rs & 15
            val = 0
            if size == 0:
                if run != 15:
                    eob[0] = 1 << run
                    if run:
                        v = r.receive(run)
                        if v is None:
                            return False
                        eob[0] += v
                    break  # rest of this block handled by the EOB branch
                # ZRL: advance over 16 zero-history coefficients
            else:
                if size != 1:
                    return False
                b = r.read_bit()
                if b is None:
                    return False
                val = p1 if b else -p1
            while k <= se:
                if coef[ZIGZAG[k]] != 0:
                    if not _refine_nonzero(r, coef, ZIGZAG[k], p1):
                        return False
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if eob[0] > 0:
        while k <= se:
            if coef[ZIGZAG[k]] != 0:
                if not _refine_nonzero(r, coef, ZIGZAG[k], p1):
                    return False
            k += 1
        eob[0] -= 1
    return True


def _progressive_scan(buf, pos, seg, frame, huff, restart_interval, state):
    """Process one SOS of a progressive stream into the coefficient
    state; returns the buffer position of the next marker, or None."""
    h, w, comps = frame
    ns = seg[0]
    if len(seg) < 1 + 2 * ns + 3:
        return None
    scan = []
    for c in range(ns):
        cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
        ci = next((i for i, cc in enumerate(comps) if cc["id"] == cs), None)
        if ci is None:
            return None
        scan.append((ci, comps[ci], tt >> 4, tt & 15))
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 15
    if se > 63 or ss > se:
        return None
    geo = _frame_geometry(frame)
    if geo is None:
        return None
    hmax, vmax, mcux, mcuy = geo
    r = _BitReader(buf, pos)

    def restart(preds, eob):
        if not r.align_and_expect_rst():
            return False
        for i in range(len(preds)):
            preds[i] = 0
        eob[0] = 0
        return True

    eob = [0]
    preds = [0] * len(scan)
    if ss == 0:
        if se != 0:
            return None  # DC and AC may not share a scan in SOF2
        if ns > 1:
            units = [
                (ci, c, dc_id)
                for ci, c, dc_id, _ in scan
            ]
            count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and count and count % restart_interval == 0:
                        if not restart(preds, eob):
                            return None
                    for si, (ci, c, dc_id) in enumerate(units):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                coef = state[ci][my * c["v"] + by, mx * c["h"] + bx]
                                if not _dc_unit(r, huff, dc_id, coef, ah, al,
                                               preds, si):
                                    return None
                    count += 1
        else:
            ci, c, dc_id, _ = scan[0]
            by_n, bx_n = _comp_block_grid(frame, c)
            count = 0
            for by in range(by_n):
                for bx in range(bx_n):
                    if restart_interval and count and count % restart_interval == 0:
                        if not restart(preds, eob):
                            return None
                    if not _dc_unit(r, huff, dc_id, state[ci][by, bx], ah, al,
                                   preds, 0):
                        return None
                    count += 1
    else:
        if ns != 1:
            return None  # AC scans are always non-interleaved
        ci, c, _, ac_id = scan[0]
        act = huff.get((1, ac_id))
        if act is None:
            return None
        by_n, bx_n = _comp_block_grid(frame, c)
        fn = _ac_first_block if ah == 0 else _ac_refine_block
        count = 0
        for by in range(by_n):
            for bx in range(bx_n):
                if restart_interval and count and count % restart_interval == 0:
                    if not restart(preds, eob):
                        return None
                if not fn(r, act, state[ci][by, bx], ss, se, al, eob):
                    return None
                count += 1
    return r.next_marker_pos()


def _dc_unit(r, huff, dc_id, coef, ah, al, preds, si):
    if ah == 0:
        dct = huff.get((0, dc_id))
        if dct is None:
            return False
        s = r.decode_symbol(dct)
        if s is None or s > 11:
            return False
        diff = 0
        if s:
            v = r.receive(s)
            if v is None:
                return False
            diff = _extend(v, s)
        preds[si] += diff
        coef[0] = preds[si] << al
    else:
        b = r.read_bit()
        if b is None:
            return False
        if b:
            coef[0] = int(coef[0]) | (1 << al)
    return True


def _reconstruct_progressive(frame, state, qt):
    h, w, comps = frame
    geo = _frame_geometry(frame)
    if geo is None:
        return None
    hmax, vmax, _, _ = geo
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            return None
        q = qt[c["tq"]].astype(np.float64)
        grid = state[ci].astype(np.float64).reshape(
            state[ci].shape[0], state[ci].shape[1], 8, 8
        ) * q
        # IDCT every block: out[y,x] = C.T @ grid[y,x] @ C
        blocks = np.einsum("ij,yxjk,kl->yxil", _C.T, grid, _C)
        plane = blocks.transpose(0, 2, 1, 3).reshape(
            state[ci].shape[0] * 8, state[ci].shape[1] * 8
        )
        planes.append(plane)
    return _finish(planes, comps, h, w, hmax, vmax)


def _decode_scan(buf, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    for c, _, _ in scan:
        if c["tq"] not in qt:
            return None
    r = _BitReader(buf, pos)
    pred = [0] * len(scan)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not r.align_and_expect_rst():
                    return None
                pred = [0] * len(scan)
            for ci, (c, dc_id, ac_id) in enumerate(scan):
                dct = huff.get((0, dc_id))
                act = huff.get((1, ac_id))
                if dct is None or act is None:
                    return None
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        s = r.decode_symbol(dct)
                        if s is None or s > 11:
                            return None
                        diff = 0
                        if s:
                            v = r.receive(s)
                            if v is None:
                                return None
                            diff = _extend(v, s)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = r.decode_symbol(act)
                            if rs is None:
                                return None
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                return None
                            v = r.receive(ss)
                            if v is None:
                                return None
                            coef[ZIGZAG[k]] = _extend(v, ss)
                            k += 1
                        block = _idct2(coef.reshape(8, 8).astype(np.float64) * q)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    return _finish(planes, [c for c, _, _ in scan], h, w, hmax, vmax)


def _finish(planes, comps, h, w, hmax, vmax):
    """Shared tail of both decode paths: level shift, nearest chroma
    upsample, crop, and (for 3 components) JFIF YCbCr→RGB."""
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            return None  # non-integer sampling ratios out of scope
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray.reshape(h, w, 1)
    if len(out_planes) != 3:
        return None
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Minimal spec-valid encoder (for round-trip tests — no image libs exist
# in this container to produce JPEG fixtures otherwise)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.clip((q * s + 50) // 100, 1, 255)
    return t.astype(np.int32)


def _fixed_length_table(symbols: list[int]):
    """Canonical Huffman table giving every symbol the same code length
    L (2^L > n_symbols, so the all-ones code stays unused as JPEG
    requires). Returns (bits, vals, {sym: (code, L)})."""
    syms = sorted(set(symbols))
    L = max(2, (len(syms) + 1).bit_length())
    bits = [0] * 16
    bits[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    # canonical code for length-only-L tables is just the index
    return bits, syms, enc


def _mag(v: int) -> tuple[int, int]:
    """(size, raw bits) of a coefficient value per the JPEG magnitude
    categories."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << s) - 1
    return s, raw


def _block_symbols(coef: np.ndarray, pred: int):
    """(dc_sym, dc_bits, [(ac_sym, bits, size)...], new_pred) for one
    quantized block in zig-zag order."""
    dc = int(coef[0])
    diff = dc - pred
    s, raw = _mag(diff)
    acs = []
    run = 0
    last = 0
    for k in range(1, 64):
        if coef[k]:
            last = k
    for k in range(1, last + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))
            run -= 16
        ss, rr = _mag(v)
        acs.append(((run << 4) | ss, rr, ss))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return s, raw, acs, dc


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode H×W×{1,3} uint8 as baseline JFIF. ``subsample=True`` uses
    4:2:0 (2×2 box-filtered chroma); restart_interval emits RSTn every N
    MCUs. Tables: quality-scaled Annex K quant, per-image fixed-length
    canonical Huffman."""
    arr = np.asarray(arr, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch == 3:
        r_, g_, b_ = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        planes = [y, cb, cr]
    else:
        planes = [arr[..., 0]]
        subsample = False
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)
    qts = [ql] + ([qc, qc] if ch == 3 else [])
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * len(planes)
    hmax = max(s[0] for s in samp[: len(planes)])
    vmax = max(s[1] for s in samp[: len(planes)])
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component padded (and possibly subsampled) planes
    comp_planes = []
    for ci, p in enumerate(planes):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):
            # box-filter down by the ratio (2×2 for 4:2:0 chroma)
            ry, rx = vmax // sv, hmax // sh
            ph = -(-h // ry) * ry
            pw = -(-w // rx) * rx
            pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            p = pp.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        th = mcuy * sv * 8
        tw = mcux * sh * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        comp_planes.append(p)

    # pass 1: quantize all blocks in MCU order, collecting symbols
    dc_syms: list[list[int]] = [[] for _ in planes]
    ac_syms: list[list[int]] = [[] for _ in planes]
    preds = [0] * len(planes)
    mcu_seq = []  # (ci, coef) in emission order
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                preds = [0] * len(planes)
                mcu_seq.append(("RST", None))
            for ci, p in enumerate(comp_planes):
                sh, sv = samp[ci]
                q = qts[ci]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        f = _dct2(block)
                        zz = np.array(
                            [int(round(f.flat[ZIGZAG[k]] / q.flat[ZIGZAG[k]]))
                             for k in range(64)],
                            dtype=np.int32,
                        )
                        s, raw, acs, preds[ci] = _block_symbols(zz, preds[ci])
                        dc_syms[ci].append(s)
                        ac_syms[ci].extend(sym for sym, _, _ in acs)
                        mcu_seq.append((ci, (s, raw, acs)))
            mcu_count += 1

    # tables: luma (comp 0) and, for color, shared chroma (comps 1+2)
    groups = [[0]] + ([[1, 2]] if ch == 3 else [])
    dc_tabs, ac_tabs, comp_tab = {}, {}, {}
    for ti, grp in enumerate(groups):
        dsyms = [s for ci in grp for s in dc_syms[ci]]
        asyms = [s for ci in grp for s in ac_syms[ci]]
        dc_tabs[ti] = _fixed_length_table(dsyms or [0])
        ac_tabs[ti] = _fixed_length_table(asyms or [0])
        for ci in grp:
            comp_tab[ci] = ti

    out = bytearray(b"\xff\xd8")
    # APP0 JFIF
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT
    for ti, q in enumerate([ql] + ([qc] if ch == 3 else [])):
        zz = bytes(int(q.flat[ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + zz
    # SOF0
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * len(planes)) + b"\x08"
    out += struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci in range(len(planes)):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else (1 if ch == 3 else 0)])
    # DHT
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals, _) in tabs.items():
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(tc << 4) | ti]) + bytes(bits) + bytes(vals)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(planes)) + bytes([len(planes)])
    for ci in range(len(planes)):
        ti = comp_tab[ci]
        out += bytes([ci + 1, (ti << 4) | ti])
    out += b"\x00\x3f\x00"
    # entropy-coded data
    bw = _BitWriter()
    rst = 0
    for ci, payload in mcu_seq:
        if ci == "RST":
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            continue
        s, raw, acs = payload
        ti = comp_tab[ci]
        _, _, dce = dc_tabs[ti]
        _, _, ace = ac_tabs[ti]
        code, length = dce[s]
        bw.write(code, length)
        if s:
            bw.write(raw, s)
        for sym, rbits, ssize in acs:
            code, length = ace[sym]
            bw.write(code, length)
            if ssize:
                bw.write(rbits, ssize)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
