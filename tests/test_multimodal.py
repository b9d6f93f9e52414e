"""Real-codec tests: encode->decode round trips for the pure-Python
PPM(P6)/BMP24 parsers, container-layout edge cases (row padding,
top-down BMP, PPM header comments), and the guarded seam for formats
the environment has no codecs for."""

import numpy as np
import pytest

from lightfusion_spark.operators.multimodal import (
    decode_image,
    encode_bmp24,
    encode_ppm,
)


def _img(w, h, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (5, 7), (16, 9)])
def test_ppm_round_trip(w, h):
    px = _img(w, h)
    fmt, gw, gh, mr, mg, mb = decode_image(encode_ppm(w, h, px))
    assert (fmt, gw, gh) == ("ppm", w, h)
    n = w * h
    assert (mr, mg, mb) == tuple(
        float(px[:, :, c].sum(dtype=np.int64)) / n for c in range(3)
    )


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (5, 7), (16, 9), (3, 2)])
def test_bmp_round_trip(w, h):
    # w=5 and w=3 rows are not multiples of 4 bytes -> exercises padding
    px = _img(w, h, seed=1)
    fmt, gw, gh, mr, mg, mb = decode_image(encode_bmp24(w, h, px))
    assert (fmt, gw, gh) == ("bmp", w, h)
    n = w * h
    assert (mr, mg, mb) == tuple(
        float(px[:, :, c].sum(dtype=np.int64)) / n for c in range(3)
    )


def test_bmp_pixel_positions_not_just_means():
    # catch layout bugs means can't see: decode back the raw pixel grid
    # via per-row single-pixel images of distinct values
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(3, 2, 3)
    payload = encode_bmp24(2, 3, px)
    from lightfusion_spark.operators.multimodal import _decode_bmp

    _, w, h, got = _decode_bmp(payload)
    assert np.array_equal(got, px)


def test_bmp_top_down_negative_height():
    px = _img(4, 3, seed=2)
    payload = bytearray(encode_bmp24(4, 3, px))
    # flip to top-down: negate height, reorder rows
    import struct

    struct.pack_into("<i", payload, 22, -3)
    row_size = 4 * 3  # multiple of 4 already
    body = payload[54:]
    rows = [bytes(body[i * row_size : (i + 1) * row_size]) for i in range(3)]
    payload[54:] = b"".join(reversed(rows))
    from lightfusion_spark.operators.multimodal import _decode_bmp

    _, w, h, got = _decode_bmp(bytes(payload))
    assert (w, h) == (4, 3)
    assert np.array_equal(got, px)


def test_ppm_header_with_comments_and_whitespace():
    px = _img(3, 2, seed=3)
    payload = b"P6\n# a comment line\n 3\t2 # trailing\n255\n" + px.tobytes()
    fmt, w, h, mr, mg, mb = decode_image(payload)
    assert (fmt, w, h) == ("ppm", 3, 2)
    assert mr == float(px[:, :, 0].sum(dtype=np.int64)) / 6


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError, match="JPEG|codec|magic"):
        decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    from lightfusion_spark.operators.multimodal import _decode_bmp

    bad = bytearray(encode_bmp24(2, 2, _img(2, 2)))
    import struct

    struct.pack_into("<H", bad, 28, 8)  # 8bpp
    with pytest.raises(NotImplementedError, match="bpp"):
        _decode_bmp(bytes(bad))


def test_synthesize_and_decode_media_spark(spark):
    from lightfusion_spark.operators import multimodal

    src = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    out = multimodal.decode_media(
        multimodal.synthesize_media(src), real=True
    ).collect()
    assert len(out) == 20
    by_id = {r["doc_id"]: r for r in out}
    for i in (0, 7):
        w, h = 4 + i % 13, 3 + i % 7
        n = w * h
        r = by_id[i]
        assert (r["fmt"], r["width"], r["height"]) == (
            "ppm" if i % 2 == 0 else "bmp", w, h
        )
        expect_r = float(sum((i * 31 + 3 * p) % 256 for p in range(n))) / n
        assert r["mean_r"] == expect_r
