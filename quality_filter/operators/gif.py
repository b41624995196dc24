"""Pure-python/numpy GIF decoder (GIF87a/GIF89a, first frame).

LZW decompression, global/local color tables, interlacing, transparency
(composited over white), sub-block framing.  Animated GIFs decode to
their first frame — the frame-sampling operator handles the video-like
case at the row level.  Completes the web-image container trio next to
the PNG and baseline-JPEG codecs (operators/multimodal.py, jpeg.py).

A matching minimal encoder (no compression tricks: emits clear codes
liberally) drives round-trip tests; real-encoder validation uses GIF
fixtures shipped inside host Python distributions when present.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while pos < len(data) or nbits >= code_size:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
            if not entry:
                raise ValueError("bad gif lzw start code")
        elif code < len(table) and table[code]:
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            raise ValueError("bad gif lzw code")
        out.extend(entry)
        if len(out) >= expected:
            return out[:expected]
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError("truncated gif lzw stream")
    return out[:expected]


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> np.ndarray:
    """First frame → (H, W, 3) uint8 RGB (transparency over white).
    Raises ValueError for any malformed/truncated input."""
    return decode_gif_frames(b, max_frames=1)[0]


def decode_gif_frames(b: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    """All frames of a (possibly animated) GIF → list of (H, W, 3)
    uint8 RGB canvases.  Frames composite onto the running canvas
    ("leave in place" semantics; disposal method 2 restores the region
    to white).  The video-frame-source realization for the media stage:
    explode_gif_frames turns these into rows that frame_sample and
    decode_features consume."""
    try:
        frames = _decode_gif(b, max_frames)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated gif: {e}") from e
    if not frames:
        raise ValueError("gif has no image frame")
    return frames


def _decode_gif(b: bytes, max_frames: int | None = None) -> list[np.ndarray]:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a gif")
    sw, sh, flags, bg, _ = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    transparent = None
    disposal = 0
    canvas = None
    frames: list[np.ndarray] = []
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension
            label = b[pos + 1]
            pos += 2
            if label == 0xF9 and b[pos] >= 4:  # graphic control
                packed = b[pos + 1]
                disposal = (packed >> 2) & 7
                transparent = b[pos + 4] if packed & 1 else None
            while b[pos] != 0:  # skip sub-blocks
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("gif missing color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.array(
                _lzw_decode(bytes(data), min_code, iw * ih), dtype=np.int64
            )
            if (idx >= len(ct)).any():
                raise ValueError("gif index out of palette")
            frame = idx.reshape(ih, iw)
            if iflags & 0x40:  # interlaced: reorder rows
                de = np.empty_like(frame)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        de[y] = frame[src]
                        src += 1
                frame = de
            rgb = ct[frame].astype(np.uint8)
            if canvas is None:
                canvas = np.full((sh or ih, sw or iw, 3), 255, dtype=np.uint8)
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transparent is not None and transparent < len(ct):
                opaque = frame != transparent
                region[opaque] = rgb[opaque]  # transparent pixels show through
            else:
                region[...] = rgb
            frames.append(canvas.copy())
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:  # restore region to background (white)
                canvas[iy : iy + ih, ix : ix + iw] = 255
            transparent = None
            disposal = 0
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError("bad gif block")
    return frames



def _quantize(arr: np.ndarray, levels: int):
    if levels ** 3 > 256:
        raise ValueError("levels**3 must fit a gif palette")
    step = 255 // (levels - 1) if levels > 1 else 0
    quant = (arr.astype(np.int64) * levels // 256) * step
    colors, inverse = np.unique(quant.reshape(-1, 3), axis=0, return_inverse=True)
    bits = max(2, int(len(colors) - 1).bit_length())
    palette = np.zeros((1 << bits, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    return palette, inverse, bits


def _lzw_encode(inverse, min_code: int) -> bytes:
    """Clear-code-per-pixel LZW stream (fixed code size) + sub-blocks."""
    clear = 1 << min_code
    code_size = min_code + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in inverse:
        emit(int(v))
        emit(clear)
    emit(clear + 1)
    if nbits:
        stream.append(acc & 0xFF)
    out = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _frame_bytes(arr: np.ndarray, levels: int, local: bool) -> bytes:
    """Image-descriptor block (with a local color table) for one frame."""
    h, w = arr.shape[:2]
    palette, inverse, bits = _quantize(arr, levels)
    out = bytearray()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x80 | (bits - 1))
    out += palette.tobytes()
    out += bytes([bits])
    out += _lzw_encode(inverse, bits)
    return bytes(out)


def encode_gif_animated(frames: list[np.ndarray], levels: int = 6) -> bytes:
    """Full-size frames → animated GIF89a, one LOCAL color table per
    frame (palettes may differ), leave-in-place disposal — so decoding
    returns exactly the quantized per-frame images."""
    h, w = frames[0].shape[:2]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global color table
    for arr in frames:
        if arr.shape[:2] != (h, w):
            raise ValueError("animated frames must share dimensions")
        out += _frame_bytes(arr, levels, local=True)
    out += b"\x3b"
    return bytes(out)


def encode_gif(arr: np.ndarray, levels: int = 6) -> bytes:
    """(H, W, 3) uint8 → single-frame GIF89a.  Channels are uniformly
    quantized to ``levels`` values (levels**3 <= 256 guarantees the
    palette fits); the LZW stream emits a clear code before every pixel
    code — maximally dumb, spec-valid, trivially correct."""
    if levels ** 3 > 256:
        raise ValueError("levels**3 must fit a gif palette")
    h, w = arr.shape[:2]
    # idempotent mapping: level k -> 255//(levels-1) * k, so re-encoding
    # an already-quantized image is a no-op (the plain round-trip law)
    step = 255 // (levels - 1) if levels > 1 else 0
    quant = (arr.astype(np.int64) * levels // 256) * step
    flat = quant.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    bits = max(2, int(len(colors) - 1).bit_length())
    table_size = 1 << bits
    palette = np.zeros((table_size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    min_code = bits
    clear = 1 << min_code

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out += bytes([min_code])

    acc = 0
    nbits = 0
    code_size = min_code + 1
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in inverse:
        emit(int(v))
        emit(clear)  # reset the table every pixel: code size never grows
    emit(clear + 1)  # end code
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
