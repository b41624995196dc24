"""Pure-numpy baseline TIFF decoder (TIFF 6.0).

Covers the practical web/archive TIFF space: both byte orders, chunky
planar config, strip layout, 8-bit samples, photometric gray (incl.
white-is-zero), RGB/RGBA, palette; compressions none (1), LZW (5, the
TIFF MSB-first variant with EarlyChange), PackBits (32773), and
Deflate (8 / old-style 32946, stdlib zlib); horizontal-differencing
predictor (2).  Everything else raises ValueError → the media stage
quarantines the row (same contract as the JPEG/GIF/PNG decoders).

A tiny uncompressed/PackBits encoder exists for round-trip tests; the
real-encoder fixture is CPython's test suite python.tiff (uncompressed
RGBA, little-endian).

Behavioral-contract analog: the reference's image-handle decode step
(/root/reference/opennsfw2/_inference.py:30-33) — one more real
container behind the same `payload BINARY` column.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


def _read_ifd(b: bytes, fmt: str, off: int) -> dict[int, list[int]]:
    if off + 2 > len(b):
        raise ValueError("truncated tiff ifd")
    (n,) = struct.unpack_from(fmt + "H", b, off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(b):
            raise ValueError("truncated tiff ifd entry")
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", b, base)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", b, base + 8)
        if voff + size > len(b):
            raise ValueError("truncated tiff tag value")
        if typ == 3:
            vals = list(struct.unpack_from(fmt + f"{cnt}H", b, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(fmt + f"{cnt}I", b, voff))
        elif typ == 1:
            vals = list(b[voff : voff + cnt])
        else:
            vals = [struct.unpack_from(fmt + "I", b, base + 8)[0]]
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated packbits")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("short packbits strip")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first codes, 256=clear, 257=EOI, EarlyChange
    (code width bumps one code early)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:  # EOI
                if len(out) < expected:
                    raise ValueError("short tiff lzw strip")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad tiff lzw start code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad tiff lzw code")
            out += entry
            prev = entry
            # EarlyChange: width bumps when the NEXT code would overflow
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise ValueError("truncated tiff lzw strip")
    return bytes(out[:expected])


def decode_tiff(b: bytes) -> np.ndarray:
    """TIFF → (H, W, 3) uint8 RGB (first IFD only)."""
    if b[:4] == b"II*\x00":
        fmt = "<"
    elif b[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise ValueError("not a tiff")
    (ifd_off,) = struct.unpack_from(fmt + "I", b, 4)
    t = _read_ifd(b, fmt, ifd_off)

    def one(tag: int, default=None):
        v = t.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff missing tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("bad tiff dimensions")
    spp = one(277, 1)
    bits = t.get(258, [8])
    if any(x != 8 for x in bits):
        raise ValueError("non-8-bit tiff unsupported")
    comp = one(259, 1)
    photometric = one(262)
    predictor = one(317, 1)
    if one(284, 1) != 1:
        raise ValueError("planar tiff unsupported")
    offsets = t.get(273)
    counts = t.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff missing strip layout")
    rows_per_strip = one(278, h)

    row_bytes = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(b):
            raise ValueError("truncated tiff strip")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        expected = nrows * row_bytes
        chunk = b[off : off + cnt]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("short tiff strip")
            raw += chunk[:expected]
        elif comp == 5:
            raw += _lzw_decode(chunk, expected)
        elif comp in (8, 32946):
            raw += zlib.decompress(chunk)[:expected]
        elif comp == 32773:
            raw += _unpackbits(chunk, expected)
        else:
            raise ValueError(f"tiff compression {comp} unsupported")
    if len(raw) < h * row_bytes:
        raise ValueError("short tiff image data")
    arr = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(h, w, spp)

    if predictor == 2:
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ValueError("tiff predictor unsupported")

    if photometric in (0, 1):  # gray (0 = white-is-zero)
        g = arr[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.stack([g, g, g], axis=2)
    if photometric == 2:  # RGB(A) — alpha/extra samples dropped
        if spp < 3:
            raise ValueError("tiff rgb with <3 samples")
        return arr[:, :, :3].copy()
    if photometric == 3:  # palette
        cmap = t.get(320)
        if not cmap or len(cmap) != 3 * 256:
            raise ValueError("tiff palette missing/odd size")
        lut = (np.array(cmap, dtype=np.uint32).reshape(3, 256).T >> 8).astype(np.uint8)
        idx = arr[:, :, 0]
        return lut[idx]
    raise ValueError(f"tiff photometric {photometric} unsupported")


def encode_tiff(arr: np.ndarray, compression: str = "none") -> bytes:
    """(H, W, 3) uint8 RGB → minimal little-endian TIFF (one strip;
    'none' or 'packbits') — exists to drive the decoder in tests."""
    h, w = arr.shape[:2]
    body = arr.astype(np.uint8).tobytes()
    if compression == "packbits":
        comp_id = 32773
        packed = bytearray()
        data = body
        i = 0
        while i < len(data):
            run = 1
            while i + run < len(data) and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 2:
                packed += bytes([257 - run, data[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < len(data) and j - i < 128
                    and not (j + 1 < len(data) and data[j] == data[j + 1])
                ):
                    j += 1
                packed += bytes([j - i - 1]) + data[i:j]
                i = j
        body = bytes(packed)
    elif compression == "deflate":
        comp_id = 8
        body = zlib.compress(body)
    else:
        comp_id = 1
    data_off = 8
    ifd_off = data_off + len(body)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 3, None), (259, 3, 1, comp_id),
        (262, 3, 1, 2), (273, 4, 1, data_off), (277, 3, 1, 3),
        (278, 3, 1, h), (279, 4, 1, len(body)),
    ]
    bits_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"II*\x00") + struct.pack("<I", ifd_off) + body
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 258:
            out += struct.pack("<HHII", tag, typ, cnt, bits_off)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next IFD
    out += struct.pack("<3H", 8, 8, 8)
    return bytes(out)
