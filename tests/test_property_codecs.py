"""Property-based tests: the builtin lossless image codecs (PNG, BMP, GIF,
TIFF) roundtrip ARBITRARY uint8 arrays bit-exactly under arbitrary shapes,
channel counts, byte orders, strip layouts and interlacing, and the
PackBits kernel roundtrips arbitrary byte strings. Hypothesis shrinks any
failure to a minimal array — a stronger guarantee than the fixed-seed
roundtrips in test_stages.py (JPEG is lossy, so its guarantees live in the
analytic/PSNR tests instead)."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from ml_data_pipeline_ray.stages.multimodal import (_packbits_decode,
                                                    _packbits_encode,
                                                    decode_bmp, decode_gif,
                                                    decode_png, decode_tiff,
                                                    encode_bmp, encode_gif,
                                                    encode_png, encode_tiff)


@st.composite
def images(draw, channels=(1, 2, 3, 4), max_dim=24):
    h = draw(st.integers(min_value=1, max_value=max_dim))
    w = draw(st.integers(min_value=1, max_value=max_dim))
    c = draw(st.sampled_from(list(channels)))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    flavor = draw(st.sampled_from(["random", "constant", "gradient"]))
    rng = np.random.default_rng(seed)
    if flavor == "random":
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    elif flavor == "constant":
        img = np.full((h, w, c), int(rng.integers(0, 256)), np.uint8)
    else:
        img = ((np.arange(h)[:, None, None] * 3
                + np.arange(w)[None, :, None]
                + np.arange(c)[None, None, :] * 40) % 256).astype(np.uint8)
    return img


@settings(max_examples=30, deadline=None)
@given(images(), st.booleans())
def test_png_roundtrip_property(img, interlace):
    assert (decode_png(encode_png(img, interlace=interlace)) == img).all()


@settings(max_examples=30, deadline=None)
@given(images(channels=(3,)))
def test_bmp_roundtrip_property(img):
    assert (decode_bmp(encode_bmp(img)) == img).all()


@settings(max_examples=30, deadline=None)
@given(images(channels=(1,)))
def test_gif_roundtrip_property(img):
    # index image against the identity grayscale palette
    idx = img[:, :, 0]
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    assert (decode_gif(encode_gif(idx)) == pal[idx]).all()


@settings(max_examples=30, deadline=None)
@given(images(channels=(1, 3, 4)), st.booleans(), st.booleans(),
       st.integers(min_value=1, max_value=9))
def test_tiff_roundtrip_property(img, big_endian, packbits, rps):
    buf = encode_tiff(img, big_endian=big_endian, packbits=packbits,
                      rows_per_strip=rps)
    assert (decode_tiff(buf) == img).all()


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_packbits_roundtrip_property(raw):
    if not raw:
        assert bytes(_packbits_decode(b"", 0)) == b""
        return
    assert bytes(_packbits_decode(_packbits_encode(raw), len(raw))) == raw
