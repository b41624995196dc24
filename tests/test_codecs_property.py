"""Property-based codec tests (hypothesis): random images/signals
round-trip the pure-numpy codecs — lossless formats exactly, lossy ones
within their quantization bounds.  Complements the fixed-vector tests in
test_multimodal.py the same way the extraction fuzz complements the
extraction goldens."""

import numpy as np
from hypothesis import given, settings, strategies as st

from quality_filter.operators.gif import decode_gif, encode_gif
from quality_filter.operators.jpeg import decode_jpeg, encode_jpeg
from quality_filter.operators.multimodal import (
    _to_bmp, decode_bmp, decode_png, decode_ppm, decode_wav,
    encode_png, encode_ppm, encode_wav, resize_nearest,
)

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _img(w, h, seed, lo=0, hi=256):
    return np.random.default_rng(seed).integers(lo, hi, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**31 - 1))
def test_ppm_bmp_png_lossless(dim, seed):
    w, h = dim
    px = _img(w, h, seed)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    assert (decode_bmp(_to_bmp(px)) == px).all()
    assert (decode_png(encode_png(px)) == px).all()


@settings(max_examples=10, deadline=None)
@given(dims, st.integers(0, 2**31 - 1), st.booleans())
def test_jpeg_bounded_error(dim, seed, subsample):
    w, h = dim
    # keep pixels off the extremes so RGB<->YCbCr clipping (which mixes
    # channels) stays out of the bound being tested
    px = _img(w, h, seed, lo=32, hi=224)
    out = decode_jpeg(encode_jpeg(px, subsample=subsample, q=2))
    assert out.shape == px.shape
    # luma is NEVER subsampled, so the Y projection is tightly bounded by
    # the flat q=2 quantization in both modes; chroma on random noise is
    # legitimately lossy under 4:2:0, so RGB error is only bounded 4:4:4
    wts = np.array([0.299, 0.587, 0.114])
    y_err = np.abs(out.astype(np.float64) @ wts - px.astype(np.float64) @ wts)
    assert y_err.max() <= 12
    if not subsample:
        err = np.abs(out.astype(np.int64) - px.astype(np.int64))
        assert err.max() <= 8


@settings(max_examples=15, deadline=None)
@given(dims, st.integers(0, 2**31 - 1))
def test_gif_exact_to_quantized_palette(dim, seed):
    w, h = dim
    px = _img(w, h, seed)
    out = decode_gif(encode_gif(px, levels=6))
    quant = ((px.astype(np.int64) * 6 // 256) * 51).astype(np.uint8)
    assert (out == quant).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 5000), st.sampled_from([8000, 16000, 44100]), st.integers(0, 2**31 - 1))
def test_wav_quantization_bound(n, rate, seed):
    sig = np.random.default_rng(seed).uniform(-1, 1, n)
    samples, r = decode_wav(encode_wav(sig, rate))
    assert r == rate and len(samples) == n
    # encode scales by 32767 and truncates; decode divides by 32768
    assert np.abs(samples - sig).max() <= 2.0 / 32767


@settings(max_examples=15, deadline=None)
@given(dims, dims, st.integers(0, 2**31 - 1))
def test_resize_shape_and_value_domain(dim_in, dim_out, seed):
    w, h = dim_in
    ow, oh = dim_out
    px = _img(w, h, seed)
    out = resize_nearest(px, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel is an input pixel (nearest neighbor)
    assert set(np.unique(out)) <= set(np.unique(px))


@settings(max_examples=15, deadline=None)
@given(dims, st.sampled_from(["none", "packbits", "deflate"]), st.integers(0, 2**31 - 1))
def test_tiff_roundtrip_exact(dim, comp, seed):
    from quality_filter.operators.tiff import decode_tiff, encode_tiff

    w, h = dim
    px = _img(w, h, seed)
    assert (decode_tiff(encode_tiff(px, comp)) == px).all()


@settings(max_examples=10, deadline=None)
@given(dims, st.integers(0, 2**31 - 1))
def test_progressive_jpeg_equals_baseline(dim, seed):
    from quality_filter.operators.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    w, h = dim
    px = _img(w, h, seed)
    assert (
        decode_jpeg(encode_jpeg_progressive(px)) == decode_jpeg(encode_jpeg(px))
    ).all()
