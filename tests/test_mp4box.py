"""ISO-BMFF container walk (operators/mp4box.py): writer/reader round
trips plus hand-built boxes for the reader paths the writer never emits
(64-bit largesize, size-0 to-EOF, version-1 full boxes, unknown-box
skipping) and loud-failure checks for malformed structure."""

import struct

import pytest

from lightfusion_spark.operators.mp4box import (
    Mp4Info,
    _box,
    _full,
    build_mp4,
    parse_mp4,
)


def _tracks(n=1):
    ts = [
        dict(handler="vide", codec="avc1", timescale=30000,
             duration=90000, n_samples=90, sample_size=1200),
        dict(handler="soun", codec="mp4a", timescale=8000,
             duration=24000, n_samples=187, sample_size=0),
    ]
    return ts[:n]


def test_roundtrip_both_stsz_forms():
    blob = build_mp4(1000, 3000, _tracks(2), mdat=b"\x01" * 20)
    info = parse_mp4(blob)
    assert info.major_brand == "isom"
    assert (info.movie_timescale, info.movie_duration) == (1000, 3000)
    assert info.mdat_bytes == 20
    v, a = info.tracks
    assert (v.handler, v.codec, v.timescale, v.duration) == (
        "vide", "avc1", 30000, 90000)
    assert v.n_samples == 90 and v.sample_bytes == 90 * 1200  # uniform stsz
    assert a.n_samples == 187
    assert a.sample_bytes == sum(100 + i for i in range(187))  # table stsz


def test_unknown_boxes_are_skipped_by_size():
    blob = build_mp4(1000, 2000, _tracks(1))
    # splice an unknown top-level box between ftyp and moov
    ftyp_end = struct.unpack(">I", blob[:4])[0]
    junk = _box(b"uuid", b"\xde\xad" * 10)
    spliced = blob[:ftyp_end] + junk + blob[ftyp_end:]
    info = parse_mp4(spliced)
    assert len(info.tracks) == 1 and info.movie_duration == 2000


def test_64bit_largesize_and_size0_mdat():
    blob = build_mp4(1000, 2000, _tracks(1), mdat=b"")
    # rebuild the mdat as a largesize box + append a size-0 free box
    assert blob.endswith(_box(b"mdat", b""))
    base = blob[: -8]
    large_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 24)
        + b"\x00" * 24
    )
    tail_free = struct.pack(">I", 0) + b"free" + b"\x00" * 11
    info = parse_mp4(base + large_mdat + tail_free)
    assert info.mdat_bytes == 24  # largesize body counted correctly


def test_version1_mvhd_and_mdhd():
    # hand-build a v1 moov: 64-bit times/durations
    mvhd = _full(
        b"mvhd", 1, 0,
        struct.pack(">QQ", 0, 0) + struct.pack(">I", 90000)
        + struct.pack(">Q", 123456789)
        + b"\x00" * 80,
    )
    mdhd = _full(
        b"mdhd", 1, 0,
        struct.pack(">QQ", 0, 0) + struct.pack(">I", 48000)
        + struct.pack(">Q", 987654)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"x\x00")
    entry = _box(b"opus", b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">I", 2)
                 + struct.pack(">II", 10, 1) + struct.pack(">II", 5, 2))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 33, 15))
    stbl = _box(b"stbl", stsd + stts + stsz)
    trak = _box(b"trak", _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))
    ftyp = _box(b"ftyp", b"iso6" + struct.pack(">I", 0) + b"iso6")
    blob = ftyp + _box(b"moov", mvhd + trak)
    info = parse_mp4(blob)
    assert info.movie_timescale == 90000
    assert info.movie_duration == 123456789
    t = info.tracks[0]
    assert (t.handler, t.codec) == ("soun", "opus")
    assert (t.timescale, t.duration) == (48000, 987654)
    assert t.n_samples == 15  # multi-entry stts summed
    assert t.sample_bytes == 33 * 15


def test_malformed_is_loud():
    blob = build_mp4(1000, 2000, _tracks(1))
    with pytest.raises(ValueError, match="missing ftyp or moov"):
        parse_mp4(b"\x00" * 32)
    # box overrunning its container
    bad = struct.pack(">I", 10_000) + b"junk" + b"\x00" * 8
    with pytest.raises(ValueError, match="overruns"):
        parse_mp4(blob + bad)
    # truncated header
    with pytest.raises(ValueError, match="truncated"):
        parse_mp4(blob + b"\x00\x00\x00")
    # trak without hdlr
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">II", 0, 0)
                 + struct.pack(">II", 1000, 1) + b"\x00" * 80)
    trak = _box(b"trak", _box(b"mdia", b""))
    with pytest.raises(ValueError, match="hdlr"):
        parse_mp4(ftyp + _box(b"moov", mvhd + trak))


def test_nested_size0_box_is_loud():
    """Round-12 advice: ISO 14496-12 §4.2 permits size==0 (extends to
    EOF) only for the LAST TOP-LEVEL box; a size-0 box nested inside a
    container is malformed and must raise, never be silently scoped to
    its container.  A top-level trailing size-0 box stays accepted
    (covered by test_64bit_largesize_and_size0_mdat)."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">II", 0, 0)
                 + struct.pack(">II", 1000, 1) + b"\x00" * 80)
    nested_size0 = struct.pack(">I", 0) + b"free" + b"\x00" * 4
    with pytest.raises(ValueError, match="size-0"):
        parse_mp4(ftyp + _box(b"moov", mvhd + nested_size0))


def test_parse_result_shape():
    info = parse_mp4(build_mp4(1000, 2000, _tracks(2)))
    assert isinstance(info, Mp4Info) and len(info.tracks) == 2
