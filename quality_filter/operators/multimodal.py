"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `payload BINARY` plus a
typed metadata struct — the same pattern as `html BINARY` in the pages
table and the reference's image-handle input
(/root/reference/opennsfw2/_inference.py:30-41).  Decode / feature
extraction / resize run as Arrow-batched ``mapInPandas`` stages with
per-worker codec caching, exactly like the text model stage.

Decode capability ladder (strictly additive — an optional library can
only ADD decodable formats, never degrade output):

  1. built-in pure-numpy decoders: PPM (P6), BMP (uncompressed
     24/32-bit), PNG (8-bit gray/RGB/RGBA/palette, Adam7, stdlib zlib),
     baseline JPEG (operators/jpeg.py: full T.81 sequential DCT —
     generic DHT/DQT, subsampling, restarts), GIF (operators/gif.py:
     LZW, interlace, transparency), and WAV (PCM 8/16/32 + float32) —
     real pixel/sample decode, no external libraries;
  2. PIL, if installed, for containers the built-ins don't recognize;
  3. otherwise a clearly-marked deterministic fake (digest-derived
     features) keeps opaque payloads flowing with decode_ok=true.

A payload whose container IS recognized (magic bytes) but whose body is
malformed decodes to decode_ok=false (quarantine discipline, the
content-type-sniff lesson from
/root/reference/app/services/file_service.py:125-156) — it never fails
the task.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("payload_crc", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        # ppm|bmp|png|jpeg|gif|wav|pil|stub|null; on a malformed recognized
        # container this is the SNIFFED container name (decode_ok=false)
        T.StructField("decoder", T.StringType(), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),  # resized, PPM-encoded
        T.StructField("resize_ok", T.BooleanType(), False),
    ]
)


# ---------------------------------------------------------------------------
# pure-numpy codecs (no external image libraries)
# ---------------------------------------------------------------------------

def _ppm_header_tokens(b: bytes, n: int) -> tuple[list[int], int]:
    """Parse n whitespace-separated integers after the P6 magic,
    honoring '#' comments (PPM spec); returns (values, body_offset)."""
    vals: list[int] = []
    i = 2  # past 'P6'
    while len(vals) < n:
        if i >= len(b):
            raise ValueError("truncated ppm header")
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(b) and b[j : j + 1].isdigit():
                j += 1
            vals.append(int(b[i:j]))
            i = j
        else:
            raise ValueError("bad ppm header byte")
    # exactly one whitespace char separates maxval from the raster
    if i >= len(b) or not b[i : i + 1].isspace():
        raise ValueError("missing ppm raster separator")
    return vals, i + 1


def decode_ppm(b: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8.  Raises ValueError on a
    malformed body (the caller quarantines)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    (w, h, maxval), off = _ppm_header_tokens(b, 3)
    if w <= 0 or h <= 0 or not (0 < maxval < 65536):
        raise ValueError("bad ppm dimensions")
    if maxval > 255:
        raise ValueError("16-bit ppm unsupported")
    need = w * h * 3
    body = b[off : off + need]
    if len(body) < need:
        raise ValueError("truncated ppm raster")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6)."""
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"



PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, channels: int):
    """Un-filter h scanlines of w pixels starting at raw[pos]; returns
    ((h, w*channels) uint8, new_pos).  All five filter types."""
    stride = w * channels
    if len(raw) - pos < h * (stride + 1):
        raise ValueError("truncated png raster")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left context
            cur = np.zeros(stride, dtype=np.uint8)
            bpp = channels
            if ftype == 1:
                cur[:bpp] = line[:bpp]
                for x in range(bpp, stride):
                    cur[x] = (int(line[x]) + int(cur[x - bpp])) & 0xFF
            elif ftype == 3:
                for x in range(stride):
                    left = int(cur[x - bpp]) if x >= bpp else 0
                    cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            else:  # Paeth
                for x in range(stride):
                    a = int(cur[x - bpp]) if x >= bpp else 0
                    up = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError("bad png filter type")
        out[y] = cur
        prev = cur
    return out, pos


def decode_png(b: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode → (H, W, 3) uint8 RGB.

    Supports the shapes that cover virtually all web PNGs: 8-bit depth,
    color types 0 (gray), 2 (RGB), 3 (palette/PLTE), 4 (gray+alpha),
    6 (RGBA); all five scanline filters; Adam7 interlacing.  16-bit
    raises ValueError → quarantine.  Alpha is dropped
    (the reference convert("RGB") behavior,
    /root/reference/opennsfw2/_image.py:30-31)."""
    if b[:8] != PNG_MAGIC:
        raise ValueError("not a png")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated png chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("bad png palette")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("png missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError("png variant unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or w <= 0 or h <= 0:
        raise ValueError("png color type unsupported")
    if color == 3 and plte is None:
        raise ValueError("palette png missing PLTE")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        sub, _ = _png_unfilter(raw, 0, w, h, channels)
        px = sub.reshape(h, w, channels)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, xs, ys in PNG_ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            sub, pos = _png_unfilter(raw, pos, pw, ph, channels)
            px[y0::ys, x0::xs] = sub.reshape(ph, pw, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 2:
        return px
    if color == 3:
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("png index out of palette")
        return plte[idx]
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # RGBA -> RGB


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → minimal non-interlaced RGB PNG (filter 0)."""
    h, w = arr.shape[:2]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    raw = b"".join(
        b"\x00" + np.ascontiguousarray(arr[y], dtype=np.uint8).tobytes()
        for y in range(h)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP (BITMAPINFOHEADER) → (H, W, 3) uint8 RGB: uncompressed
    24/32-bit, 8-bit palette (BI_RGB), and RLE8 (BI_RLE8, incl. delta
    and absolute runs).  Bottom-up or top-down rows, 4-byte padding.
    Raises ValueError on anything else."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a bmp")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise ValueError("bmp core header unsupported")
    w, h_signed = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    clr_used = struct.unpack_from("<I", b, 46)[0]
    h = abs(h_signed)
    if planes != 1 or w <= 0 or h == 0:
        raise ValueError("bad bmp header")
    if bpp == 8 and compression in (0, 1):  # palette, raw or RLE8
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(b, np.uint8, n_colors * 4, pal_off).reshape(-1, 4)
        lut = pal[:, 2::-1].copy()  # BGRX → RGB
        if compression == 0:
            stride = (w + 3) & ~3
            need = stride * h
            body = b[data_off : data_off + need]
            if len(body) < need:
                raise ValueError("truncated bmp raster")
            idx = np.frombuffer(body, np.uint8).reshape(h, stride)[:, :w]
        else:
            idx = _bmp_rle8(b[data_off:], w, h)
        if int(idx.max(initial=0)) >= n_colors:
            raise ValueError("bmp palette index out of range")
        px = lut[idx]
        return px[::-1] if h_signed > 0 else px
    if bpp not in (24, 32) or compression not in (0, 3):
        raise ValueError("bmp variant unsupported")
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    need = stride * h
    body = b[data_off : data_off + need]
    if len(body) < need:
        raise ValueError("truncated bmp raster")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) → RGB, drop alpha


def _bmp_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """RLE8 decode → (h, w) palette indices in STORAGE row order
    (caller flips for bottom-up): encoded runs, absolute runs with
    word alignment, end-of-line (0,0), end-of-bitmap (0,1), and
    delta (0,2,dx,dy) escapes."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    while i + 1 < len(data) and y < h:
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:  # encoded run
            end = min(x + n, w)
            out[y, x:end] = v
            x = end
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("truncated bmp rle delta")
            x = min(x + data[i], w)
            y += data[i + 1]
            i += 2
        else:  # absolute run of v literal indices, word-aligned
            if i + v > len(data):
                raise ValueError("truncated bmp rle absolute run")
            end = min(x + v, w)
            out[y, x:end] = np.frombuffer(data, np.uint8, end - x, i)
            x = end
            i += v + (v & 1)
    return out


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM decode → (mono float64 samples in [-1, 1], rate).
    Supports PCM 8/16/32-bit and IEEE float32, any channel count
    (averaged to mono).  Raises ValueError on anything else."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a wav")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short wav fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav missing fmt/data")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if n_ch < 1 or rate <= 0:
        raise ValueError("bad wav header")
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError("wav encoding unsupported")
    usable = (len(x) // n_ch) * n_ch
    if usable == 0:
        raise ValueError("empty wav data")
    return x[:usable].reshape(-1, n_ch).mean(axis=1), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono float [-1,1] → 16-bit PCM WAV (test/fixture helper)."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1, 1)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """16-dim deterministic audio features (the spectral-summary analog
    of image_features): duration/rate scalars, amplitude stats,
    zero-crossing rate, and FFT band energies over a bounded head
    window.  float64 math, float32 output."""
    x = np.asarray(samples, dtype=np.float64)
    n = len(x)
    dur = n / rate
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    absx = np.abs(x)
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    head = x[: 8192]
    spec = np.abs(np.fft.rfft(head))
    power = spec * spec
    total = float(power.sum())
    if total > 0:
        freqs = np.fft.rfftfreq(len(head), d=1.0 / rate)
        centroid = float((freqs * power).sum() / total) / (rate / 2)
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))]) / (rate / 2)
        thirds = np.array_split(power, 3)
        bands = [float(t.sum() / total) for t in thirds]
    else:
        centroid, rolloff, bands = 0.0, 0.0, [0.0, 0.0, 0.0]
    peak = float(absx.max()) if n else 0.0
    return np.array(
        [
            min(np.log10(n + 1.0) / 8.0, 1.0),
            min(rate / 48000.0, 1.0),
            min(np.log10(dur + 1.0) / 4.0, 1.0),
            rms,
            float(absx.mean()) if n else 0.0,
            peak,
            float(x.std()) if n else 0.0,
            rms / peak if peak > 0 else 0.0,   # inverse crest factor
            zcr,
            centroid,
            rolloff,
            *bands,
            float(np.percentile(absx, 50)) if n else 0.0,
            float(np.percentile(absx, 90)) if n else 0.0,
        ],
        dtype=np.float32,
    )


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize — the resize(224,224)
    preprocessing analog (/root/reference/opennsfw2/_image.py:48-59)."""
    h, w = arr.shape[:2]
    yi = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xi = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[yi][:, xi]


def image_features(arr: np.ndarray) -> np.ndarray:
    """16-dim deterministic features from decoded pixels, all in [0, 1]:
    per-channel mean+std (6), aspect, log-area, 2x2 gray grid means (4),
    gray mean/std/min/max (4).  float64 math, float32 output — the
    frozen-preprocessing-constants discipline
    (/root/reference/opennsfw2/_image.py:64-66)."""
    h, w = arr.shape[:2]
    px = arr.astype(np.float64) / 255.0
    gray = px @ np.array([0.299, 0.587, 0.114])
    hh, wh = max(h // 2, 1), max(w // 2, 1)
    grid = [
        float(gray[ys, xs].mean())
        for ys in (slice(0, hh), slice(hh, None))
        for xs in (slice(0, wh), slice(wh, None))
        if gray[ys, xs].size
    ]
    grid += [0.0] * (4 - len(grid))
    feats = np.array(
        [
            *px.reshape(-1, 3).mean(axis=0),
            *px.reshape(-1, 3).std(axis=0),
            w / (w + h),
            min(np.log10(float(w) * h + 1.0) / 8.0, 1.0),
            *grid,
            float(gray.mean()),
            float(gray.std()),
            float(gray.min()),
            float(gray.max()),
        ],
        dtype=np.float32,
    )
    return feats


def _try_real_decoder():
    """Optional PIL path for containers the built-ins don't recognize
    (gated import — the lazy-dependency lesson,
    /root/reference/opennsfw2/_compat.py).  Presence only ADDS formats."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _stub_features(payload: bytes, dim: int = IMAGE_FEATURE_DIM) -> np.ndarray:
    """STUB: deterministic pseudo-features from a digest of the payload —
    the declared fake for opaque (unrecognized-container) payloads in an
    environment with no decoder for them."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


# A malformed-but-recognized container can fail DEEP in a codec with an
# exception class of the failing layer, not just ValueError: corrupt PNG
# IDAT → zlib.error, short IHDR chunk → struct.error, JPEG truncated
# mid-scan → IndexError.  Every decode seam normalizes these to
# ValueError so the quarantine contract ("malformed decodes to
# decode_ok=false, never fails the task") holds for any corruption.
MALFORMED_ERRORS = (ValueError, zlib.error, struct.error, IndexError)


def sniff_container(b: bytes) -> str | None:
    """Magic-byte container sniff: the single dispatch the decode, the
    decoder-label column, and the malformed-row label all share."""
    if b[:2] == b"P6":
        return "ppm"
    if b[:2] == b"BM":
        return "bmp"
    if b[:8] == PNG_MAGIC:
        return "png"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


def decode_pixels(b: bytes, pil=None) -> np.ndarray | None:
    """Pixels for a recognized container, None for an opaque payload.
    Raises ValueError when a RECOGNIZED container is malformed — the
    caller quarantines that row; opaque payloads are not an error."""
    kind = sniff_container(b)
    try:
        if kind == "ppm":
            return decode_ppm(b)
        if kind == "bmp":
            return decode_bmp(b)
        if kind == "png":
            return decode_png(b)
        if kind == "jpeg":
            from quality_filter.operators.jpeg import decode_jpeg

            return decode_jpeg(b)
        if kind == "gif":
            from quality_filter.operators.gif import decode_gif

            return decode_gif(b)
        if kind == "tiff":
            from quality_filter.operators.tiff import decode_tiff

            return decode_tiff(b)
    except MALFORMED_ERRORS as e:
        raise ValueError(f"malformed {kind}: {e}") from e
    if pil is not None:
        try:
            img = pil.open(io.BytesIO(b))
            return np.asarray(img.convert("RGB"), dtype=np.uint8)
        except Exception:
            # PIL couldn't identify/decode it → treat as opaque, exactly
            # as if PIL were absent (capability detection must never
            # make output worse)
            return None
    return None


def decode_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas media decode/featurize stage.

    One Arrow batch per kernel invocation (the B-row batched-inference
    contract, /root/reference/opennsfw2/_inference.py:64-84); malformed
    recognized-container payloads set decode_ok=false instead of failing
    the task (quarantine discipline)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _try_real_decoder()
        for pdf in batches:
            feats, ok, sizes, crcs, decoders = [], [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None); ok.append(False)
                    sizes.append(None); crcs.append(None); decoders.append(None)
                    continue
                b = bytes(payload)
                sizes.append(len(b))
                crcs.append(zlib.crc32(b))
                container = sniff_container(b)
                try:
                    if container == "wav":
                        samples, rate = decode_wav(b)
                        feats.append(audio_features(samples, rate).tolist())
                        ok.append(True); decoders.append("wav")
                        continue
                    px = decode_pixels(b, pil)
                except MALFORMED_ERRORS:
                    feats.append(None); ok.append(False)
                    decoders.append(container or "malformed")
                    continue
                if px is not None:
                    feats.append(image_features(px).tolist()); ok.append(True)
                    decoders.append(container or "pil")
                else:
                    feats.append(_stub_features(b).tolist()); ok.append(True)
                    decoders.append("stub")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pd.array(sizes, dtype="Int64"),
                    "payload_crc": pd.array(crcs, dtype="Int64"),
                    "features": feats,
                    "decode_ok": ok,
                    "decoder": decoders,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """mapInPandas resize stage: decode → nearest-neighbor resize →
    re-encode as PPM.  Rows whose payload has no pixel decode (opaque or
    malformed) emit a NULL payload with resize_ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _try_real_decoder()
        for pdf in batches:
            outs, oks = [], []
            for payload in pdf["payload"]:
                px = None
                if payload is not None:
                    try:
                        px = decode_pixels(bytes(payload), pil)
                    except MALFORMED_ERRORS:
                        px = None
                if px is None:
                    outs.append(None); oks.append(False)
                else:
                    outs.append(encode_ppm(resize_nearest(px, out_w, out_h)))
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([out_w] * len(pdf), dtype="Int32"),
                    "height": pd.array([out_h] * len(pdf), dtype="Int32"),
                    "payload": outs,
                    "resize_ok": oks,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # frame, PPM-encoded
        T.StructField("frame_ok", T.BooleanType(), False),
    ]
)


def explode_frames(df: DataFrame, max_frames: int = 32) -> DataFrame:
    """Video-frame SOURCE realized: one row per frame of an animated
    container (GIF; the pattern extends to any multi-frame codec).
    Static decodable images emit their single frame; opaque/malformed
    payloads emit one frame_ok=false row (conservation + quarantine).
    Output frames are PPM so the decode/featurize/resize stages consume
    them unchanged — compose with frame_sample for decimation
    (/root/reference/opennsfw2/_inference.py:169-205's decode-then-
    sample video loop, as two relational stages)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from quality_filter.operators.gif import decode_gif_frames

        pil = _try_real_decoder()
        for pdf in batches:
            mids, idxs, counts, payloads, oks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    mids.append(mid); idxs.append(None); counts.append(None)
                    payloads.append(None); oks.append(False)
                    continue
                b = bytes(payload)
                try:
                    if b[:6] in (b"GIF87a", b"GIF89a"):
                        frames = decode_gif_frames(b, max_frames=max_frames)
                    else:
                        px = decode_pixels(b, pil)
                        frames = [px] if px is not None else None
                except MALFORMED_ERRORS:
                    frames = None
                if frames is None:
                    mids.append(mid); idxs.append(None); counts.append(None)
                    payloads.append(None); oks.append(False)
                    continue
                for i, fr in enumerate(frames):
                    mids.append(mid); idxs.append(i); counts.append(len(frames))
                    payloads.append(encode_ppm(fr)); oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "n_frames": pd.array(counts, dtype="Int64"),
                    "payload": payloads,
                    "frame_ok": oks,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


def frame_sample(df: DataFrame, every_k: int = 8) -> DataFrame:
    """Video frame-sampling analog over media rows: keep every k-th row
    per url ordered by media_id — the frame_interval decimation
    (/root/reference/opennsfw2/_inference.py:205) on binary rows."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("url").orderBy("media_id"))
    return (
        df.withColumn("rn", rn)
        .filter((F.col("rn") == 1) | ((F.col("rn") + 1) % every_k == 0))
        .drop("rn")
    )


def generate_media(n: int, seed: int = 11, real_image_every: int = 0) -> pd.DataFrame:
    """Deterministic synthetic media table.  Most payloads are random
    bytes (opaque to the engine); with ``real_image_every`` > 0, every
    k-th row carries a real decodable PPM or BMP payload so the pixel
    decoders are exercised end-to-end."""
    import random

    rnd = random.Random(seed)
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        if rnd.random() < 0.05:
            payload = None
        elif real_image_every and kind == "video" and i % (2 * real_image_every) == real_image_every - 1:
            # real animated container: a short multi-frame gif
            from quality_filter.operators.gif import encode_gif_animated

            n_frames = 3 + (i // 3) % 4
            frames = [
                np.frombuffer(rnd.randbytes(6 * 4 * 3), dtype=np.uint8).reshape(4, 6, 3)
                for _ in range(n_frames)
            ]
            payload = encode_gif_animated(frames)
        elif real_image_every and i % real_image_every == 0:
            codec = (i // real_image_every) % 8
            if codec == 3:  # real audio
                t = np.arange(1600) / 16000.0
                freq = 200 + 50 * (i % 7)
                payload = encode_wav(0.5 * np.sin(2 * np.pi * freq * t), 16000)
            else:  # real image in one of the container formats
                w, h = rnd.choice(((8, 6), (16, 9), (5, 7)))
                arr = np.frombuffer(
                    rnd.randbytes(w * h * 3), dtype=np.uint8
                ).reshape(h, w, 3)
                if codec == 4:
                    from quality_filter.operators.jpeg import encode_jpeg

                    payload = encode_jpeg(arr, subsample=bool(i % 2))
                elif codec == 5:
                    from quality_filter.operators.gif import encode_gif

                    payload = encode_gif(arr)
                elif codec == 6:  # progressive JPEG through the same stage
                    from quality_filter.operators.jpeg import encode_jpeg_progressive

                    payload = encode_jpeg_progressive(arr, subsample=bool(i % 2))
                elif codec == 7:
                    from quality_filter.operators.tiff import encode_tiff

                    payload = encode_tiff(arr, ("none", "packbits", "deflate")[i % 3])
                else:
                    payload = (encode_ppm, _to_bmp, encode_png)[codec](arr)
        else:
            payload = rnd.randbytes(rnd.randint(64, 4096))
        meta = (
            rnd.choice((320, 640, 1024)) if kind == "image" else None,
            rnd.choice((240, 480, 768)) if kind == "image" else None,
            16000 if kind == "audio" else None,
            round(rnd.uniform(1, 300), 3) if kind != "image" else None,
        )
        # rows sharing a url form one media group (e.g. frames of a video)
        group = i // 15
        rows.append((i, f"https://host{group % 7:02d}.example.com/m/{group}", kind, payload, meta))
    return pd.DataFrame(
        rows, columns=["media_id", "url", "kind", "payload", "meta"]
    )


def generate_near_dup_media(n_groups: int, seed: int = 23) -> pd.DataFrame:
    """Deterministic NEAR-DUPLICATE media corpus for the composed
    decode→featurize→LSH near-dup query: each group is one base image
    emitted as lossless PPM / PNG / BMP re-encodes (identical pixels →
    identical features → identical LSH bucket, guaranteed pairs) plus a
    lossy JPEG variant (near-identical features — the realistic
    re-encoded-web-image case) and one unrelated decoy image of the same
    dimensions.  Pure python/numpy: the DuckDB oracle twin re-runs this
    exact function driver-side (the train_ivf_centroids_local pattern)."""
    import random

    from quality_filter.operators.jpeg import encode_jpeg

    rnd = random.Random(seed)
    rows = []
    mid = 0
    for g in range(n_groups):
        w, h = rnd.choice(((12, 8), (16, 9), (9, 11)))
        base = np.frombuffer(rnd.randbytes(w * h * 3), dtype=np.uint8).reshape(h, w, 3)
        decoy = np.frombuffer(rnd.randbytes(w * h * 3), dtype=np.uint8).reshape(h, w, 3)
        variants = [
            encode_ppm(base),
            encode_png(base),
            _to_bmp(base),
            encode_jpeg(base, subsample=bool(g % 2)),
            encode_ppm(decoy),
        ]
        for payload in variants:
            rows.append(
                (mid, f"https://imgs.example.com/g/{g}", "image", payload, (w, h, None, None))
            )
            mid += 1
    return pd.DataFrame(rows, columns=["media_id", "url", "kind", "payload", "meta"])


def _to_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP."""
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = arr[:, :, ::-1]
    for y in range(h - 1, -1, -1):
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)
