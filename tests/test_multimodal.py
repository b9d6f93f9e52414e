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
    with pytest.raises(NotImplementedError, match="codec|magic"):
        decode_image(b"\x00\x01 unknown container bytes")
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    from lightfusion_spark.operators.multimodal import _decode_bmp

    bad = bytearray(encode_bmp24(2, 2, _img(2, 2)))
    import struct

    struct.pack_into("<H", bad, 28, 8)  # 8bpp
    with pytest.raises(NotImplementedError, match="bpp"):
        _decode_bmp(bytes(bad))


@pytest.mark.parametrize("w,h", [(1, 1), (4, 3), (5, 7), (16, 9), (2, 11)])
def test_png_round_trip(w, h):
    """h >= 5 rows exercises all five filter types (encoder cycles
    row % 5 through None/Sub/Up/Average/Paeth)."""
    from lightfusion_spark.operators.multimodal import _decode_png, encode_png

    px = _img(w, h, seed=4)
    payload = encode_png(w, h, px)
    fmt, gw, gh, got = _decode_png(payload)
    assert (fmt, gw, gh) == ("png", w, h)
    assert np.array_equal(got, px)
    fmt, gw, gh, mr, mg, mb = decode_image(payload)
    assert (fmt, gw, gh) == ("png", w, h)
    assert mr == float(px[:, :, 0].sum(dtype=np.int64)) / (w * h)


def test_png_decoder_against_hand_built_spec_bytes():
    """Decoder-only verification (no encoder in the loop): a 2x2 RGB PNG
    whose Sub and Paeth filtered scanlines were computed BY HAND from the
    PNG spec (§9.2/§9.4), so an encoder+decoder shared misreading of the
    filter math cannot cancel out."""
    import struct
    import zlib

    from lightfusion_spark.operators.multimodal import _decode_png, _png_chunk

    # pixels row0: (1,2,3),(4,5,6); row1: (7,8,9),(10,11,12)
    # row0 Sub   : raw - left          = 1,2,3, 3,3,3
    # row1 Paeth : x<3 pred=up (1,2,3) -> 6,6,6; x>=3 pred=left (7,8,9) -> 3,3,3
    scanlines = bytes([1, 1, 2, 3, 3, 3, 3]) + bytes([4, 6, 6, 6, 3, 3, 3])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )
    fmt, w, h, px = _decode_png(payload)
    assert (fmt, w, h) == ("png", 2, 2)
    assert np.array_equal(
        px, np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    )


def test_png_average_filter_hand_case():
    """Average defilter (floor((left+up)/2)) on hand-computed bytes."""
    import struct
    import zlib

    from lightfusion_spark.operators.multimodal import _decode_png, _png_chunk

    # 2x2, row0 None: 10,20,30,40,50,60
    # row1 Average: raw 15,25,35,45,55,65
    #   x<3 pred=floor((0+up)/2)=5,10,15 -> filt 10,15,20
    #   x>=3 pred=floor((left+up)/2)=floor((15+40)/2)=27, (25+50)/2=37, (35+60)/2=47
    #        -> filt 18,18,18
    scanlines = bytes([0, 10, 20, 30, 40, 50, 60]) + bytes([3, 10, 15, 20, 18, 18, 18])
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )
    _, _, _, px = _decode_png(payload)
    assert np.array_equal(
        px,
        np.array([[[10, 20, 30], [40, 50, 60]], [[15, 25, 35], [45, 55, 65]]], np.uint8),
    )


def test_png_multiple_idat_and_ancillary_chunks():
    """Chunk walk: IDAT split across chunks + ancillary chunks skipped."""
    import struct
    import zlib

    from lightfusion_spark.operators.multimodal import _decode_png, _png_chunk, encode_png

    px = _img(3, 2, seed=5)
    # rebuild the encoder's payload with the IDAT split in two + a tEXt chunk
    scan = _extract_idat(encode_png(3, 2, px))
    comp = zlib.compress(scan)
    half = len(comp) // 2
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"tEXt", b"Comment\x00synthetic")
        + _png_chunk(b"IDAT", comp[:half])
        + _png_chunk(b"IDAT", comp[half:])
        + _png_chunk(b"IEND", b"")
    )
    _, w, h, got = _decode_png(payload)
    assert (w, h) == (3, 2)
    assert np.array_equal(got, px)


def _extract_idat(png: bytes) -> bytes:
    import struct

    pos = 8
    out = bytearray()
    while pos + 8 <= len(png):
        (length,) = struct.unpack_from(">I", png, pos)
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            out += png[pos + 8 : pos + 8 + length]
        pos += 12 + length
    import zlib

    return zlib.decompress(bytes(out))


def test_png_unsupported_profiles_raise():
    import struct

    from lightfusion_spark.operators.multimodal import _decode_png, _png_chunk

    for depth, color, interlace in [(16, 2, 0), (8, 6, 0), (8, 2, 1)]:
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace))
        )
        with pytest.raises(NotImplementedError, match="PNG"):
            _decode_png(payload)


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


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (4, 3), (13, 7), (17, 9)])
def test_jpeg_decode_equals_encoder_reconstruction(w, h):
    """The lossy-codec contract: decode(encode(img)) must equal the
    encoder-side reconstruction BYTE-FOR-BYTE (quantize -> dequantize ->
    IDCT -> color-back, computed without the bitstream) — isolating the
    entropy-coding and marker layers the decoder parses independently."""
    from lightfusion_spark.operators import jpegcodec as jc

    px = _img(w, h, seed=6)
    payload = jc.encode_jpeg(w, h, px)
    w2, h2, got = jc.decode_jpeg(payload)
    assert (w2, h2) == (w, h)
    assert np.array_equal(got, jc.reconstruct_jpeg(w, h, px))
    # the lossy result stays near the source (sanity, not exactness)
    assert float(np.abs(got.astype(int) - px.astype(int)).mean()) < 40.0
    # and routes through decode_image
    fmt, gw, gh, mr, mg, mb = decode_image(payload)
    n = w * h
    assert (fmt, gw, gh) == ("jpeg", w, h)
    assert mr == float(got[:, :, 0].sum(dtype=np.int64)) / n


def test_jpeg_bit_stuffing_round_trip():
    """A gradient image whose entropy stream contains 0xFF bytes must
    survive the stuffing/unstuffing layer."""
    from lightfusion_spark.operators import jpegcodec as jc

    found = False
    for seed in range(12):
        px = _img(16, 16, seed=seed)
        payload = jc.encode_jpeg(16, 16, px)
        scan = payload[payload.find(b"\xff\xda") + 2 :]
        if b"\xff\x00" in scan:
            found = True
            _, _, got = jc.decode_jpeg(payload)
            assert np.array_equal(got, jc.reconstruct_jpeg(16, 16, px))
    assert found, "no test image produced a stuffed 0xFF byte — widen the search"


def test_jpeg_unsupported_profiles_raise():
    from lightfusion_spark.operators import jpegcodec as jc

    px = _img(8, 8)
    payload = bytearray(jc.encode_jpeg(8, 8, px))
    sof = payload.find(b"\xff\xc0")
    payload[sof : sof + 2] = b"\xff\xc2"  # pretend progressive
    with pytest.raises(NotImplementedError, match="baseline"):
        jc.decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"not a jpeg")


def test_jpeg_quality_monotonic():
    """Higher quality -> no smaller file and no larger reconstruction
    error (on a smooth gradient, where JPEG behaves predictably)."""
    from lightfusion_spark.operators import jpegcodec as jc

    w, h = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack([(xx * 16) % 256, (yy * 16) % 256, ((xx + yy) * 8) % 256],
                  axis=-1).astype(np.uint8)
    errs, sizes = [], []
    for q in (25, 75, 95):
        payload = jc.encode_jpeg(w, h, px, quality=q)
        _, _, got = jc.decode_jpeg(payload)
        assert np.array_equal(got, jc.reconstruct_jpeg(w, h, px, quality=q))
        errs.append(float(np.abs(got.astype(int) - px.astype(int)).mean()))
        sizes.append(len(payload))
    assert errs[0] >= errs[1] >= errs[2]
    assert sizes[0] <= sizes[2]


def test_wav_round_trip_and_chunk_walk():
    from lightfusion_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.RandomState(9)
    for n, ch in [(1, 1), (256, 2), (33, 1), (100, 3)]:
        pcm = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
        rate, gch, got = decode_wav(encode_wav(44100, pcm))
        assert (rate, gch) == (44100, ch)
        assert np.array_equal(got, pcm)

    # unknown chunks are skipped, odd-length chunks word-aligned
    pcm = rng.randint(-32768, 32768, size=(7, 1)).astype(np.int16)
    payload = encode_wav(8000, pcm)
    import struct

    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd + pad
    patched = payload[:12] + extra + payload[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, gch, got = decode_wav(patched)
    assert np.array_equal(got, pcm)

    with pytest.raises(NotImplementedError, match="16-bit PCM"):
        bad = bytearray(encode_wav(8000, pcm))
        struct.pack_into("<H", bad, 20, 3)  # float format
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_synthesize_and_decode_audio_spark(spark):
    from lightfusion_spark.operators import multimodal

    src = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = {r["doc_id"]: r for r in multimodal.decode_audio(
        multimodal.synthesize_audio(src)).collect()}
    for i in (0, 3, 9):
        ch, n = 1 + i % 2, 256 + (i % 7) * 64
        r = out[i]
        assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, ch, n)
        flat = (i * 37 + 5 * np.arange(n * ch)) % 4096 - 2048
        expect = float(np.sqrt(np.square(flat.astype(np.int64)).sum() / (n * ch)))
        assert r["rms"] == expect


def test_video_container_and_frame_sampling(spark):
    from lightfusion_spark.operators import jpegcodec as jc
    from lightfusion_spark.operators import multimodal

    # container round trip
    frames = [jc.encode_jpeg(4, 3, _img(4, 3, seed=s)) for s in range(3)]
    payload = multimodal.encode_video(frames)
    assert multimodal.iter_video_frames(payload) == frames
    with pytest.raises(NotImplementedError, match="container"):
        multimodal.iter_video_frames(b"MP4?xxxx")

    # Spark-side sampling: every 2nd frame of clips with 2..5 frames
    src = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = multimodal.sample_video_frames(
        multimodal.synthesize_video(src), every_k=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(8):
        n_frames = 2 + i % 4
        rows = sorted(by_doc[i], key=lambda r: r["frame_id"])
        assert [r["frame_id"] for r in rows] == list(range(0, n_frames, 2))
        w, h = 4 + i % 13, 3 + i % 7
        for r in rows:
            assert (r["n_frames"], r["width"], r["height"]) == (n_frames, w, h)
            vals = ((i * 31 + r["frame_id"] * 97 + np.arange(w * h * 3)) % 256).astype(
                np.uint8
            )
            px = jc.reconstruct_jpeg(w, h, vals)
            n = w * h
            assert r["mean_r"] == float(px[:, :, 0].sum(dtype=np.int64)) / n

    with pytest.raises(ValueError, match="every_k"):
        multimodal.sample_video_frames(src, every_k=0)


def test_resize_nearest_exact_mapping():
    import numpy as np

    from lightfusion_spark.operators import multimodal as mm

    # 4x2 image with distinct values: resize to 2x2 must pick rows 0,2
    # and cols 0,1 (the (i*h)//out integer mapping)
    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(4, 2, 3)
    small = mm.resize_nearest(px, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small[0, 0] == px[0, 0]).all()
    assert (small[1, 0] == px[2, 0]).all()
    # upsampling replicates source pixels
    big = mm.resize_nearest(px[:1, :1], 3, 3)
    assert (big == px[0, 0]).all()


def test_resize_media_roundtrip(spark):
    import numpy as np

    from lightfusion_spark.operators import multimodal as mm

    # a hand-built 2x2 PPM: resize to 1x1 must pick pixel (0,0) exactly
    rgb = np.array([[[10, 20, 30], [40, 50, 60]],
                    [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8)
    payload = mm.encode_ppm(2, 2, rgb)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    (row,) = mm.resize_media(df, "doc_id", out_h=1, out_w=1).collect()
    assert (row["width"], row["height"]) == (2, 2)
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == (10.0, 20.0, 30.0)


def test_audio_frame_features_windows_and_tail(spark):
    import numpy as np

    from lightfusion_spark.operators import multimodal as mm

    # 5 frames mono, window 2 -> windows of 2, 2, 1 (true tail size)
    pcm = np.array([[100], [200], [0], [0], [300]], dtype=np.int16)
    payload = mm.encode_wav(8000, pcm)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    rows = sorted(
        (r["window_idx"], r["n_frames_win"], r["rms"])
        for r in mm.audio_frame_features(df, "doc_id", frame_window=2).collect()
    )
    import math

    assert rows[0] == (0, 2, math.sqrt((100 * 100 + 200 * 200) / 2))
    assert rows[1] == (1, 2, 0.0)
    assert rows[2] == (2, 1, 300.0)  # tail: one frame, its own size


def test_audio_frame_features_rejects_bad_window(spark):
    import pytest

    from lightfusion_spark.operators import multimodal as mm

    df = spark.createDataFrame([(1, bytearray(b""))], "doc_id long, payload binary")
    with pytest.raises(ValueError, match="frame_window"):
        mm.audio_frame_features(df, "doc_id", frame_window=0)


def test_scene_cut_flags_and_first_frame(spark):
    from lightfusion_spark.operators import multimodal as mm

    frames = spark.createDataFrame(
        [
            (1, 0, 10.0, 10.0, 10.0),
            (1, 2, 12.0, 10.0, 10.0),   # diff 2 -> no cut
            (1, 4, 50.0, 40.0, 30.0),   # diff 38+30+20=88 -> cut
            (2, 0, 5.0, 5.0, 5.0),      # lone frame: never a cut
        ],
        "doc_id long, frame_id int, mean_r double, mean_g double, mean_b double",
    )
    rows = {
        (r["doc_id"], r["frame_id"]): (r["frame_diff"], r["is_cut"])
        for r in mm.detect_scene_cuts(frames, threshold=30.0).collect()
    }
    assert rows[(1, 0)] == (None, False)  # first frame: no predecessor
    assert rows[(1, 2)] == (2.0, False)
    assert rows[(1, 4)] == (88.0, True)
    assert rows[(2, 0)] == (None, False)
