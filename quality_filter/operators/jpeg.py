"""Pure-numpy baseline JPEG codec (ITU-T T.81).

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0), generic DHT/DQT
parsing, byte stuffing, restart intervals.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ValueError → the media
stage quarantines them.

Encoder: baseline, optional chroma subsampling, flat quantization,
canonical equal-length Huffman tables built per image (valid per the
spec — DHT declares arbitrary tables; equal-length canonical codes are
a legitimate if suboptimal choice).  Exists so the decoder can be
driven end-to-end in-sandbox; real-encoder validation uses JPEG
fixtures from the host's Python distributions when present.

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


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (grayscale replicated)."""
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
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
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
