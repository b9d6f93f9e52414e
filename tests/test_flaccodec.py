"""FLAC codec (operators/flaccodec.py): encoder round trips plus
hand-built bitstreams for the decoder paths the encoder never emits
(LPC, verbatim, mid/side + left/side + right/side, partitioned rice,
escape partitions, wasted bits) and loud-failure checks for every CRC.
"""

import struct

import numpy as np
import pytest

from lightfusion_spark.operators.flaccodec import (
    BitWriter,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
    encode_utf8_number,
)


def test_roundtrip_shapes_and_md5():
    rng = np.random.RandomState(7)
    for n, ch in [(1, 1), (3, 2), (256, 1), (1000, 2), (4097, 2), (9000, 1)]:
        pcm = rng.randint(-32768, 32768, size=(n, ch)).astype(np.int16)
        rate, nch, out = decode_flac(encode_flac(44100, pcm))
        assert (rate, nch) == (44100, ch)
        assert out.dtype == np.dtype("<i2") and (out == pcm).all()


def test_constant_blocks_compress_and_roundtrip():
    pcm = np.full((5000, 2), -123, dtype=np.int16)
    blob = encode_flac(8000, pcm)
    assert len(blob) < 200  # CONSTANT subframes: O(1) per block
    _, _, out = decode_flac(blob)
    assert (out == pcm).all()


def test_smooth_signal_actually_compresses():
    t = np.arange(8192)
    pcm = (1000 * np.sin(t / 20)).astype(np.int16).reshape(-1, 1)
    blob = encode_flac(16000, pcm)
    assert len(blob) < 0.3 * pcm.nbytes  # fixed predictor + rice earn keep
    _, _, out = decode_flac(blob)
    assert (out == pcm).all()


def test_streaminfo_field_width_guards():
    """Round-12 advice: BitWriter masks to field width, so an input
    past STREAMINFO's 36-bit total-samples field must fail loudly at
    encode time, not as a far-away decoder MD5 mismatch.  The guard
    fires before the contiguous copy — a zero-copy broadcast view
    exercises it without allocating 128 GiB."""
    huge = np.broadcast_to(np.int16(0), ((1 << 36), 1))
    with pytest.raises(ValueError, match="36-bit"):
        encode_flac(8000, huge)
    # one sample under the limit would pass the guard (don't run the
    # encode — just the boundary arithmetic)
    assert ((1 << 36) - 1) < (1 << 36)


def test_corruption_is_loud_everywhere():
    pcm = np.arange(-300, 300, dtype=np.int16).reshape(-1, 2)
    blob = bytearray(encode_flac(8000, pcm))
    # flip one bit in the frame payload (past the 42-byte fLaC+STREAMINFO)
    blob[60] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFnope")


# --- hand-built streams: the decoder paths our encoder never emits ------


def _streaminfo(n_ch, bps, n_total, rate=8000):
    w = BitWriter()
    w.write(4096, 16)
    w.write(4096, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(n_ch - 1, 3)
    w.write(bps - 1, 5)
    w.write(n_total, 36)
    body = w.bytes() + b"\x00" * 16  # zero MD5: decoder skips the check
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame(n_ch_code, bs, body_bits, n_ch, bps_code=0b100):
    head = bytearray()
    w = BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(0b0111, 4)  # 16-bit blocksize field
    w.write(0, 4)  # rate from streaminfo
    w.write(n_ch_code, 4)
    w.write(bps_code, 3)
    w.write(0, 1)
    head += w.bytes()
    head += encode_utf8_number(0)
    head += struct.pack(">H", bs - 1)
    head.append(crc8(bytes(head)))
    frame = bytes(head) + body_bits
    return frame + struct.pack(">H", crc16(frame))


def _rice_partition_bits(w, resid, k):
    w.write(k, 4)
    for v in resid:
        u = (v << 1) if v >= 0 else (-(v << 1) - 1)
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def test_decoder_handles_lpc_subframes():
    """LPC with order 3, precision 12, shift 10 — residuals computed by
    the test so the decoder must reproduce the exact samples."""
    bs = 64
    x = [(37 * i) % 500 - 250 for i in range(bs)]
    order, prec, shift = 3, 12, 10
    coeffs = [1536, -512, 1024]  # arbitrary 12-bit signed
    resid = []
    for i in range(order, bs):
        acc = sum(c * x[i - 1 - j] for j, c in enumerate(coeffs))
        resid.append(x[i] - (acc >> shift))
    w = BitWriter()
    w.write(0, 1)
    w.write(0b100000 | (order - 1), 6)  # LPC
    w.write(0, 1)
    for i in range(order):
        w.write(x[i] & 0xFFFF, 16)
    w.write(prec - 1, 4)
    w.write(shift, 5)
    for c in coeffs:
        w.write(c & 0xFFF, prec)
    w.write(0b00, 2)
    w.write(0, 4)  # partition order 0
    _rice_partition_bits(w, resid, 6)
    w.align()
    blob = _streaminfo(1, 16, bs) + _frame(0, bs, w.bytes(), 1)
    rate, nch, out = decode_flac(blob)
    assert nch == 1 and out[:, 0].tolist() == x


def test_decoder_handles_verbatim_partitions_escape_and_wasted_bits():
    bs = 32
    # channel 0: VERBATIM with 2 wasted bits (samples are 4*v)
    base = [(11 * i) % 200 - 100 for i in range(bs)]
    ch0 = [4 * v for v in base]
    w = BitWriter()
    w.write(0, 1)
    w.write(0b000001, 6)  # VERBATIM
    w.write(1, 1)  # wasted-bits flag
    w.write_unary(1)  # unary 1 -> wasted = 2
    for v in base:
        w.write(v & 0x3FFF, 14)  # bps 16 - 2 wasted
    # channel 1: FIXED order 1 with partition order 2 (4 partitions),
    # one of them escaped raw
    ch1 = [(7 * i) % 300 - 150 for i in range(bs)]
    resid = [ch1[i] - ch1[i - 1] for i in range(1, bs)]
    w.write(0, 1)
    w.write(0b001000 | 1, 6)
    w.write(0, 1)
    w.write(ch1[0] & 0xFFFF, 16)
    w.write(0b00, 2)
    w.write(2, 4)  # partition order 2 -> 4 partitions of 8
    parts = [resid[:7], resid[7:15], resid[15:23], resid[23:]]
    _rice_partition_bits(w, parts[0], 5)
    _rice_partition_bits(w, parts[1], 4)
    # escaped partition: param 0b1111 then 5-bit width, raw signed
    w.write(0b1111, 4)
    w.write(12, 5)
    for v in parts[2]:
        w.write(v & 0xFFF, 12)
    _rice_partition_bits(w, parts[3], 3)
    w.align()
    blob = _streaminfo(2, 16, bs) + _frame(1, bs, w.bytes(), 2)
    rate, nch, out = decode_flac(blob)
    assert out[:, 0].tolist() == ch0
    assert out[:, 1].tolist() == ch1


@pytest.mark.parametrize("mode", ["left_side", "right_side", "mid_side"])
def test_decoder_handles_stereo_decorrelation(mode):
    bs = 48
    left = [(13 * i) % 400 - 200 for i in range(bs)]
    right = [(5 * i) % 300 - 150 for i in range(bs)]
    side = [l - r for l, r in zip(left, right)]

    def verbatim(w, vals, bits):
        w.write(0, 1)
        w.write(0b000001, 6)
        w.write(0, 1)
        for v in vals:
            w.write(v & ((1 << bits) - 1), bits)

    w = BitWriter()
    if mode == "left_side":
        code = 8
        verbatim(w, left, 16)
        verbatim(w, side, 17)
    elif mode == "right_side":
        code = 9
        verbatim(w, side, 17)
        verbatim(w, right, 16)
    else:
        code = 10
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        verbatim(w, mid, 16)
        verbatim(w, side, 17)
    w.align()
    blob = _streaminfo(2, 16, bs) + _frame(code, bs, w.bytes(), 2)
    rate, nch, out = decode_flac(blob)
    assert out[:, 0].tolist() == left
    assert out[:, 1].tolist() == right
