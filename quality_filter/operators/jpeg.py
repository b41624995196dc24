"""Pure-numpy JPEG codec (ITU-T T.81): baseline + Huffman progressive.

Decoder: sequential baseline DCT (SOF0/1) AND progressive DCT (SOF2,
Annex G Huffman path: spectral selection, successive approximation
with DC and AC refinement scans, EOB runs, interleaved DC /
non-interleaved AC scan geometry, restarts) — 8-bit, grayscale or
YCbCr with arbitrary sampling factors, generic DHT/DQT parsing, byte
stuffing, restart intervals.  Arithmetic coding, hierarchical, and
12-bit precision raise ValueError → the media stage quarantines them.

Encoder: baseline plus a progressive encoder (configurable scan script
— spectral bands + successive approximation, with the buffered
correction-bit mechanism for AC refinement).  Both encoders quantize
identically, so the exact-round-trip test can assert
decode(progressive(x)) == decode(baseline(x)) BIT-FOR-BIT — the same
coefficients reach the same IDCT.  Real-encoder validation uses
baseline AND progressive fixtures found on this host (CPython test
JPEGs; nodejs doc images and Spark's mllib sample images are
libjpeg-progressive).

This gives the multimodal stage a REAL decode path for the web's most
common image container without PIL — the reference engine's whole
preprocessing is image decode (/root/reference/opennsfw2/_image.py).
"""

from __future__ import annotations

import struct

import numpy as np

# scan position -> natural (row-major) block index, T.81 Figure A.6
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: dct = T @ B @ T.T, idct = T.T @ C @ T."""
    x = np.arange(8)
    T = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    T[0] *= 1.0 / np.sqrt(2.0)
    return T


_T = _dct_matrix()


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    de-stuffing; stops at any marker (0xFF xx, xx != 0)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated jpeg entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated jpeg entropy data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise _MarkerReached(self.pos)
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.bits = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0


class _MarkerReached(Exception):
    def __init__(self, pos: int) -> None:
        self.pos = pos


def _build_huffman(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """Canonical (length, code) -> symbol map from a DHT segment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def exif_orientation(b: bytes) -> int:
    """EXIF orientation tag (1-8) from a JPEG's APP1 segment, 1 if
    absent/unreadable.  The EXIF payload IS a TIFF stream — reuses the
    TIFF IFD parser."""
    pos = 2
    while pos + 4 <= len(b) and b[pos] == 0xFF:
        marker = b[pos + 1]
        if marker in (0xDA, 0xD9):
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        if marker == 0xE1 and b[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = b[pos + 10 : pos + 2 + seglen]
            try:
                from quality_filter.operators.tiff import _read_ifd

                if tiff[:4] == b"II*\x00":
                    fmt = "<"
                elif tiff[:4] == b"MM\x00*":
                    fmt = ">"
                else:
                    return 1
                (ifd_off,) = struct.unpack_from(fmt + "I", tiff, 4)
                tags = _read_ifd(tiff, fmt, ifd_off)
                o = tags.get(274, [1])[0]
                return o if 1 <= o <= 8 else 1
            except (ValueError, struct.error, IndexError):
                return 1
        pos += 2 + seglen
    return 1


def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Upright the pixel array per the EXIF orientation value (the
    PIL exif_transpose operation table)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1]
    if orientation == 5:
        return arr.transpose(1, 0, 2)
    if orientation == 6:
        return np.rot90(arr, 3)
    if orientation == 7:
        return arr[::-1, ::-1].transpose(1, 0, 2)
    if orientation == 8:
        return np.rot90(arr, 1)
    return arr


def decode_jpeg(b: bytes, upright: bool = True) -> np.ndarray:
    """JPEG → (H, W, 3) uint8 RGB (grayscale replicated); EXIF
    orientation applied by default (no-op for orientation 1 / no EXIF,
    so all non-oriented pinned outputs are unchanged)."""
    px = _decode_jpeg_pixels(b)
    if upright:
        o = exif_orientation(b)
        if o != 1:
            px = np.ascontiguousarray(apply_orientation(px, o))
    return px


def _decode_jpeg_pixels(b: bytes) -> np.ndarray:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad jpeg marker stream")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tid] = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.float64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = list(seg[p + 17 : p + 17 + n])
                huff[(cls, tid)] = _build_huffman(counts, syms)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline(-ext)
            depth, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if depth != 8:
                raise ValueError("non-8-bit jpeg unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:  # SOF2 — Huffman progressive
            return _decode_jpeg_progressive(b)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline jpeg unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(
                b, pos + 2 + seglen, frame, qt, huff, scan_sel, restart_interval
            )
        # else: APPn/COM — skip
        pos += 2 + seglen
    raise ValueError("jpeg missing SOS")


def _decode_scan(b, pos, frame, qt, huff, scan_sel, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    preds = [0] * len(comps)
    br = _BitReader(b, pos)
    n_mcu = mcux * mcuy
    mcu = 0
    while mcu < n_mcu:
        try:
            my, mx = divmod(mcu, mcux)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_sel[c["id"]]
                dct = huff.get((0, dc_t))
                act = huff.get((1, ac_t))
                q = qt[c["tq"]]
                if dct is None or act is None:
                    raise ValueError("jpeg missing huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.float64)
                        t = _decode_symbol(br, dct)
                        diff = _extend(br.receive(t), t) if t else 0
                        preds[ci] += diff
                        coefs[0] = preds[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg AC overflow")
                            coefs[k] = _extend(br.receive(s), s) * q[k]
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coefs
                        px = _T.T @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1
            if restart_interval and mcu % restart_interval == 0 and mcu < n_mcu:
                br.align()
                if (
                    br.pos + 2 <= len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                preds = [0] * len(comps)
        except _MarkerReached as m:
            # restart marker mid-stream (tolerates encoders that emit
            # them slightly off the declared cadence)
            if b[m.pos + 1] >= 0xD0 and b[m.pos + 1] <= 0xD7:
                br.pos = m.pos + 2
                br.align()
                preds = [0] * len(comps)
                continue
            raise ValueError("unexpected marker in jpeg scan")

    return _assemble(planes, comps, h, w, hmax, vmax)


def _assemble(planes, comps, h, w, hmax, vmax) -> np.ndarray:
    """Component planes → (H, W, 3) uint8 RGB (shared by the baseline
    and progressive reconstruction paths)."""
    out = []
    for ci, c in enumerate(comps):
        p = np.clip(planes[ci], 0, 255)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = out[0].astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(out) != 3:
        raise ValueError("jpeg component count unsupported")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G, Huffman path)
# ---------------------------------------------------------------------------

def _decode_jpeg_progressive(b: bytes) -> np.ndarray:
    """SOF2 decode: scans accumulate quantized coefficients (stored in
    zigzag order) into per-component grids; dequant + IDCT happen once
    after the last scan."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    coef: list[np.ndarray] = []
    restart_interval = 0
    pos = 2
    while pos + 2 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("bad jpeg marker stream")
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7:  # stray restart between scans
            pos += 2
            continue
        if pos + 4 > len(b):
            raise ValueError("truncated jpeg")
        (seglen,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tid] = np.frombuffer(seg, np.uint8, 64, p + 1).astype(np.float64)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                huff[(cls, tid)] = _build_huffman(counts, list(seg[p + 17 : p + 17 + n]))
                p += 17 + n
        elif marker == 0xC2:
            depth, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if depth != 8:
                raise ValueError("non-8-bit jpeg unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            frame = {"h": h, "w": w, "comps": comps, "hmax": hmax, "vmax": vmax,
                     "mcux": mcux, "mcuy": mcuy}
            coef = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported frame type in progressive jpeg")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("jpeg SOS before SOF")
            pos = _decode_prog_scan(
                b, pos + 2 + seglen, seg, frame, coef, huff, restart_interval
            )
            continue
        pos += 2 + seglen
    if frame is None or not coef:
        raise ValueError("jpeg missing SOF2 frame")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    planes = []
    for ci, c in enumerate(comps):
        grid = coef[ci]
        q = qt.get(c["tq"])
        if q is None:
            raise ValueError("jpeg missing quant table")
        by, bx = grid.shape[:2]
        # dequant (zigzag domain) → dezigzag → batched IDCT
        deq = grid.astype(np.float64) * q[None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, ZIGZAG] = deq
        blocks = nat.reshape(by, bx, 8, 8)
        px = np.einsum("ij,yxjk,kl->yxil", _T.T, blocks, _T) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes.append(plane)
    return _assemble(planes, comps, h, w, frame["hmax"], frame["vmax"])


def _comp_block_grid(frame, c) -> tuple[int, int]:
    """Non-interleaved scan geometry: blocks over the COMPONENT's own
    sampled dimensions (T.81 A.2.2 — NOT the padded MCU coverage)."""
    cw = -(-frame["w"] * c["h"] // frame["hmax"])
    ch = -(-frame["h"] * c["v"] // frame["vmax"])
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(b, data_pos, seg, frame, coef, huff, restart_interval) -> int:
    comps = frame["comps"]
    ns = seg[0]
    sel = []
    for c in range(ns):
        cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
        ci = next((i for i, cc in enumerate(comps) if cc["id"] == cid), None)
        if ci is None:
            raise ValueError("jpeg scan references unknown component")
        sel.append((ci, tabs >> 4, tabs & 0xF))
    ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahl >> 4, ahl & 0xF
    if se > 63 or ss > se:
        raise ValueError("bad jpeg spectral selection")
    br = _BitReader(b, data_pos)
    state = {"eobrun": 0, "preds": [0] * len(comps)}

    if ss == 0:
        if se != 0:
            raise ValueError("jpeg DC scan with nonzero Se")
        dc_tables = {}
        for ci, dct, _ in sel:
            if ah == 0:
                t = huff.get((0, dct))
                if t is None:
                    raise ValueError("jpeg missing huffman table")
                dc_tables[ci] = t

        def unit(u):
            if len(sel) > 1:
                my, mx = divmod(u, frame["mcux"])
                for ci, _, _ in sel:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _dc_coef(
                                br, coef[ci], my * c["v"] + by, mx * c["h"] + bx,
                                dc_tables.get(ci), state, ci, ah, al,
                            )
            else:
                ci = sel[0][0]
                _, gw = _comp_block_grid(frame, comps[ci])
                _dc_coef(br, coef[ci], u // gw, u % gw, dc_tables.get(ci), state, ci, ah, al)

        if len(sel) > 1:
            n_units = frame["mcux"] * frame["mcuy"]
        else:
            gh, gw = _comp_block_grid(frame, comps[sel[0][0]])
            n_units = gh * gw
    else:
        if ns != 1:
            raise ValueError("jpeg interleaved AC scan is invalid")
        ci, _, act_id = sel[0]
        act = huff.get((1, act_id))
        if act is None:
            raise ValueError("jpeg missing huffman table")
        gh, gw = _comp_block_grid(frame, comps[ci])
        n_units = gh * gw

        def unit(u):
            blk = coef[ci][u // gw, u % gw]
            if ah == 0:
                _ac_first(br, blk, act, ss, se, al, state)
            else:
                _ac_refine(br, blk, act, ss, se, al, state)

    u = 0
    while u < n_units:
        try:
            unit(u)
            u += 1
            if restart_interval and u % restart_interval == 0 and u < n_units:
                br.align()
                if (
                    br.pos + 2 <= len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                state["eobrun"] = 0
                state["preds"] = [0] * len(comps)
        except _MarkerReached as m:
            if m.pos + 1 < len(b) and 0xD0 <= b[m.pos + 1] <= 0xD7:
                br.pos = m.pos + 2
                br.align()
                state["eobrun"] = 0
                state["preds"] = [0] * len(comps)
                continue
            raise ValueError("unexpected marker in progressive jpeg scan")
    # advance to the next marker after the entropy-coded data
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:  # trailing restart
                p += 2
                continue
            return p
        p += 1
    return len(b)


def _dc_coef(br, grid, by, bx, dct, state, ci, ah, al) -> None:
    if by >= grid.shape[0] or bx >= grid.shape[1]:
        raise ValueError("jpeg block out of range")
    if ah == 0:  # DC first: diff-coded, point-transformed
        t = _decode_symbol(br, dct)
        diff = _extend(br.receive(t), t) if t else 0
        state["preds"][ci] += diff
        grid[by, bx, 0] = state["preds"][ci] << al
    else:  # DC refinement: one raw bit per block
        if br.read_bit():
            grid[by, bx, 0] |= 1 << al


def _ac_first(br, blk, act, ss, se, al, state) -> None:
    """G.1.2.2: first AC scan of a band — EOB runs + point transform."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(br, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg AC overflow")
        blk[k] = _extend(br.receive(s), s) << al
        k += 1


def _ac_refine(br, blk, act, ss, se, al, state) -> None:
    """G.1.2.3: AC successive-approximation refinement — correction
    bits for history coefficients, ±1<<Al insertions for new ones."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_symbol(br, act)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad jpeg AC refinement symbol")
                newval = p1 if br.read_bit() else m1
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        blk[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("jpeg AC refinement overflow")
                blk[k] = newval
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            v = int(blk[k])
            if v != 0:
                if br.read_bit() and (v & p1) == 0:
                    blk[k] = v + (p1 if v >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc, self.n = 0, 0


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_value(v: int) -> tuple[int, int]:
    t = _category(v)
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _equal_length_table(symbols: set[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Canonical equal-length code over the used symbols (valid prefix
    code; n < 2^L keeps the all-ones code unused per the spec)."""
    syms = sorted(symbols)
    n = len(syms)
    L = 1
    while (1 << L) <= n:
        L += 1
    counts = [0] * 16
    counts[L - 1] = n
    enc = {s: (L, i) for i, s in enumerate(syms)}
    return counts, syms, enc


def encode_jpeg(
    arr: np.ndarray, subsample: bool = False, q: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 → baseline JPEG (flat quantization q, optional
    2x2 chroma subsampling, optional DRI restart markers every
    ``restart_interval`` MCUs — exercises the decoder's restart path)."""
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    if subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
        crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
        cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtab = np.full(64, float(q))

    # pad planes to full MCU coverage
    padded = []
    for (fh, fv), p in zip(factors, planes):
        ph, pw = mcuy * fv * 8, mcux * fh * 8
        padded.append(np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

    # pass 1: quantized coefficients per block, in MCU-interleaved order
    blocks: list[tuple[int, np.ndarray]] = []  # (component index, zigzag coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        co = _T @ blk @ _T.T
                        zz = np.rint(co.reshape(64)[ZIGZAG] / qtab).astype(np.int64)
                        blocks.append((ci, zz))

    # pass 2: symbol statistics -> equal-length canonical tables
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}
    preds = [0, 0, 0]
    sym_stream: list[tuple] = []
    blocks_per_mcu = sum(fh * fv for fh, fv in factors)
    mcu_starts: set[int] = set()  # indices into sym_stream where a new MCU begins
    for bi, (ci, zz) in enumerate(blocks):
        if bi % blocks_per_mcu == 0:
            mcu_idx = bi // blocks_per_mcu
            mcu_starts.add(len(sym_stream))
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                preds = [0, 0, 0]  # DC predictors reset at restart markers
        tcls = 0 if ci == 0 else 1
        t, bits = _encode_value(int(zz[0]) - preds[ci])
        preds[ci] = int(zz[0])
        dc_syms[tcls].add(t)
        stream = [("dc", tcls, t, bits)]
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[tcls].add(0xF0)
                stream.append(("ac", tcls, 0xF0, 0, 0))
                run -= 16
            s, bits = _encode_value(v)
            rs = (run << 4) | s
            ac_syms[tcls].add(rs)
            stream.append(("ac", tcls, rs, s, bits))
            run = 0
        if last_nz < 63:
            ac_syms[tcls].add(0x00)
            stream.append(("ac", tcls, 0x00, 0, 0))
        sym_stream.append(tuple(stream))

    tables = {}
    for tcls in (0, 1):
        dc_counts, dc_list, dc_enc = _equal_length_table(dc_syms[tcls] or {0})
        ac_counts, ac_list, ac_enc = _equal_length_table(ac_syms[tcls] or {0})
        tables[tcls] = (dc_counts, dc_list, dc_enc, ac_counts, ac_list, ac_enc)

    # pass 3: emit
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in qtab))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC0, sof)
    for tcls in (0, 1):
        dc_counts, dc_list, _, ac_counts, ac_list, _ = tables[tcls]
        out += seg(0xC4, bytes([tcls]) + bytes(dc_counts) + bytes(dc_list))
        out += seg(0xC4, bytes([0x10 | tcls]) + bytes(ac_counts) + bytes(ac_list))
    sos = bytes([3])
    for ci in range(3):
        tcls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tcls << 4) | tcls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    n_mcus = 0
    for si, stream in enumerate(sym_stream):
        if si in mcu_starts and si:
            mcu_idx = n_mcus = n_mcus + 1
            if restart_interval and mcu_idx % restart_interval == 0 and mcu_idx < mcux * mcuy:
                bw.flush()  # byte-align (pad with 1s), then raw marker
                bw.out += bytes([0xFF, 0xD0 + ((mcu_idx // restart_interval - 1) % 8)])
        for item in stream:
            if item[0] == "dc":
                _, tcls, t, bits = item
                L, code = tables[tcls][2][t]
                bw.write(code, L)
                if t:
                    bw.write(bits, t)
            else:
                _, tcls, rs, s, bits = item
                L, code = tables[tcls][5][rs]
                bw.write(code, L)
                if s:
                    bw.write(bits, s)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (scan script: spectral bands + successive approximation)
# ---------------------------------------------------------------------------

def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero."""
    a = abs(int(v)) >> al
    return a if v >= 0 else -a


def _quantized_comp_grids(arr, subsample, q):
    """Per-component (bh, bw, 64) zigzag-quantized coefficient grids —
    the SAME per-block math as encode_jpeg's pass 1 (same expressions,
    same order), so progressive and baseline streams carry identical
    coefficients and the round-trip test can assert exact equality."""
    h, w = arr.shape[:2]
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    if subsample:
        factors = [(2, 2), (1, 1), (1, 1)]
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cbp = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
        crp = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
        cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
    else:
        factors = [(1, 1), (1, 1), (1, 1)]
    planes = [y, cb, cr]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtab = np.full(64, float(q))
    grids = []
    for (fh, fv), p in zip(factors, planes):
        ph, pw = mcuy * fv * 8, mcux * fh * 8
        pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        grid = np.zeros((mcuy * fv, mcux * fh, 64), dtype=np.int64)
        for by in range(mcuy * fv):
            for bx in range(mcux * fh):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                co = _T @ blk @ _T.T
                grid[by, bx] = np.rint(co.reshape(64)[ZIGZAG] / qtab).astype(np.int64)
        grids.append(grid)
    return factors, grids, h, w, hmax, vmax, mcux, mcuy, qtab


class _ScanOps:
    """Symbol/bit op collector for one scan: pass 1 gathers the Huffman
    symbol alphabet, pass 2 writes the entropy stream."""

    def __init__(self) -> None:
        self.ops: list[tuple] = []
        self.syms: set[int] = set()

    def sym(self, s: int) -> None:
        self.syms.add(s)
        self.ops.append(("sym", s))

    def bits(self, value: int, n: int) -> None:
        if n:
            self.ops.append(("bits", value, n))

    def write(self, bw: _BitWriter, enc: dict[int, tuple[int, int]]) -> None:
        for op in self.ops:
            if op[0] == "sym":
                L, code = enc[op[1]]
                bw.write(code, L)
            else:
                bw.write(op[1], op[2])


def encode_jpeg_progressive(
    arr: np.ndarray, subsample: bool = False, q: int = 8,
    bands: tuple = ((1, 5), (6, 63)), dc_al: int = 1, ac_al: int = 1,
) -> bytes:
    """(H, W, 3) uint8 → progressive JPEG (SOF2), libjpeg-style scan
    script: interleaved DC first at Al=dc_al → per-component AC first
    scans per spectral band at Al=ac_al → DC refinement scans down to 0
    → per-component AC refinement scans down to 0 (full G.1.2.3
    buffered-correction-bit encoder).  Quantization is bit-identical to
    encode_jpeg's, so decode(progressive) == decode(baseline) exactly."""
    factors, grids, h, w, hmax, vmax, mcux, mcuy, qtab = _quantized_comp_grids(
        arr, subsample, q
    )
    frame = {"h": h, "w": w, "hmax": hmax, "vmax": vmax,
             "comps": [{"h": fh, "v": fv} for fh, fv in factors]}

    def comp_grid_dims(ci):
        return _comp_block_grid(frame, frame["comps"][ci])

    scans: list[tuple] = []  # (kind, params...)
    scans.append(("dc_first", dc_al))
    for ci in range(3):
        for (bss, bse) in bands:
            scans.append(("ac_first", ci, bss, bse, ac_al))
    for al in range(dc_al - 1, -1, -1):
        scans.append(("dc_refine", al))
    for al in range(ac_al - 1, -1, -1):
        for ci in range(3):
            for (bss, bse) in bands:
                scans.append(("ac_refine", ci, bss, bse, al))

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in qtab))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += seg(0xC2, sof)

    for scan in scans:
        kind = scan[0]
        ops = _ScanOps()
        if kind == "dc_first":
            al = scan[1]
            preds = [0, 0, 0]
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (fh, fv) in enumerate(factors):
                        for by in range(fv):
                            for bx in range(fh):
                                v = int(grids[ci][my * fv + by, mx * fh + bx, 0]) >> al
                                t, bits = _encode_value(v - preds[ci])
                                preds[ci] = v
                                ops.sym(t)
                                ops.bits(bits, t)
            counts, syms, enc = _equal_length_table(ops.syms or {0})
            out += seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
            sos = bytes([3])
            for ci in range(3):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, al])  # Ss=0 Se=0 Ah=0 Al
            out += seg(0xDA, sos)
            bw = _BitWriter()
            ops.write(bw, enc)
            bw.flush()
            out += bw.out
        elif kind == "dc_refine":
            al = scan[1]
            bw = _BitWriter()
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (fh, fv) in enumerate(factors):
                        for by in range(fv):
                            for bx in range(fh):
                                bw.write((int(grids[ci][my * fv + by, mx * fh + bx, 0]) >> al) & 1, 1)
            sos = bytes([3])
            for ci in range(3):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 0, ((al + 1) << 4) | al])
            out += seg(0xDA, sos)
            bw.flush()
            out += bw.out
        elif kind == "ac_first":
            ci, bss, bse, al = scan[1:]
            gh, gw = comp_grid_dims(ci)
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    ops.sym(r << 4)
                    ops.bits(eobrun - (1 << r), r)
                    eobrun = 0

            for u in range(gh * gw):
                zz = grids[ci][u // gw, u % gw]
                vals = [_trunc_shift(zz[k], al) for k in range(bss, bse + 1)]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for i in range(last_nz + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ops.sym(0xF0)
                        run -= 16
                    s, bits = _encode_value(v)
                    ops.sym((run << 4) | s)
                    ops.bits(bits, s)
                    run = 0
                if last_nz < len(vals) - 1:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            counts, syms, enc = _equal_length_table(ops.syms or {0})
            out += seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(syms))
            out += seg(0xDA, bytes([1, ci + 1, 0x00, bss, bse, al]))
            bw = _BitWriter()
            ops.write(bw, enc)
            bw.flush()
            out += bw.out
        else:  # ac_refine
            ci, bss, bse, al = scan[1:]
            gh, gw = comp_grid_dims(ci)
            p1 = 1 << al
            eobrun = 0
            be: list[int] = []

            def flush_eob_refine():
                nonlocal eobrun, be
                if eobrun:
                    r = eobrun.bit_length() - 1
                    ops.sym(r << 4)
                    ops.bits(eobrun - (1 << r), r)
                    eobrun = 0
                    for bit in be:
                        ops.bits(bit, 1)
                    be = []

            for u in range(gh * gw):
                zz = grids[ci][u // gw, u % gw]
                absv = [abs(int(zz[k])) >> al for k in range(bss, bse + 1)]
                eob = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        eob = i
                run = 0
                br_bits: list[int] = []
                for i, t in enumerate(absv):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eob:
                        flush_eob_refine()
                        ops.sym(0xF0)
                        run -= 16
                        for bit in br_bits:
                            ops.bits(bit, 1)
                        br_bits = []
                    if t > 1:
                        br_bits.append(t & 1)
                        continue
                    flush_eob_refine()
                    ops.sym((run << 4) | 1)
                    run = 0
                    ops.bits(1 if zz[bss + i] > 0 else 0, 1)
                    for bit in br_bits:
                        ops.bits(bit, 1)
                    br_bits = []
                if run > 0 or br_bits:
                    eobrun += 1
                    be.extend(br_bits)
                    if eobrun == 0x7FFF or len(be) > 900:
                        flush_eob_refine()
            flush_eob_refine()
            counts, syms, enc = _equal_length_table(ops.syms or {0})
            out += seg(0xC4, bytes([0x10]) + bytes(counts) + bytes(syms))
            out += seg(0xDA, bytes([1, ci + 1, 0x00, bss, bse, ((al + 1) << 4) | al]))
            bw = _BitWriter()
            ops.write(bw, enc)
            bw.flush()
            out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
