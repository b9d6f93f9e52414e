"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``BinaryType`` columns
with structured metadata alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so the bytes never round-trip through
Python row objects one at a time.

Two decode paths:

* ``real=True`` — a REAL, dependency-free image decode for the three
  formats a pure-Python parser can own outright: binary **PPM (P6)**,
  **24-bit uncompressed BMP** (bottom-up or top-down, row padding
  handled), and **8-bit RGB non-interlaced PNG** (stdlib ``zlib``
  inflate + all five scanline defilters including Paeth).
  ``decode_image`` parses headers + pixel data and emits (format,
  width, height, per-channel mean) — byte-exact, so a SQL oracle
  replaying the pixel formula verifies the whole encode→decode round
  trip.  Baseline JPEG is real too (:mod:`.jpegcodec`), and since r12
  compressed audio has a real lossless member: **FLAC**
  (:mod:`.flaccodec` — rice coding, fixed/LPC predictors, CRC-8/16,
  STREAMINFO MD5; :func:`synthesize_flac`/:func:`decode_flac_audio`).
  Formats beyond that (MP3/AAC, non-RGB8 PNG profiles, progressive
  JPEG) still raise ``NotImplementedError``: their codec libraries are
  not in this environment, and that seam is where PIL/ffmpeg would
  plug in.
* ``real=False`` — the original deterministic fake decoder (metadata
  from byte length only), kept for payloads in formats the real parser
  doesn't own.

100 TB notes: payload columns dominate I/O, so (a) keep them in their
own parquet column (column pruning skips them unless decoded), (b)
decode with ``mapInPandas`` per input split — no shuffle, memory bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — and (c) emit only
extracted features, never re-emit payload bytes, so downstream stages
shuffle kilobytes not megabytes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the fake-decode stage.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, fake_frames int"
)

#: Output schema of the real-decode stage.
DECODE_REAL_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media payload: UTF-8 bytes of the text column.

    In a real pipeline this column would come from the source parquet
    (image/audio bytes); the plumbing downstream is identical.
    """
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic 'decode': metadata derived from the byte length only,
    so a SQL oracle can verify the distributed plumbing end-to-end."""
    n = len(payload)
    return n, 16 + n % 32, 16 + n % 24, 1 + n % 7


# ---------------------------------------------------------------------------
# real codecs: binary PPM (P6), 24-bit uncompressed BMP, and 8-bit RGB PNG
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: np.ndarray) -> bytes:
    """Binary PPM (P6): ASCII header + raw interleaved RGB rows."""
    px = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    return f"P6\n{width} {height}\n255\n".encode("ascii") + px.tobytes()


def encode_bmp24(width: int, height: int, rgb: np.ndarray) -> bytes:
    """24-bit uncompressed BMP (BITMAPINFOHEADER): BGR pixel order,
    bottom-up rows, each row zero-padded to a 4-byte boundary."""
    px = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr_rows_bottom_up = px[::-1, :, ::-1]
    row_size = (width * 3 + 3) & ~3
    pad = row_size - width * 3
    body = bytearray()
    for row in bgr_rows_bottom_up:
        body += row.tobytes() + b"\x00" * pad
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left /
    above / upper-left is closest to ``a + b - c``, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: np.ndarray) -> bytes:
    """8-bit RGB non-interlaced PNG (color type 2).

    Each scanline's filter type cycles ``row % 5`` through
    None/Sub/Up/Average/Paeth — deliberately, so a decode round trip
    exercises ALL five defilters (a fixed filter 0 would leave the
    Sub/Up/Average/Paeth arms untested).
    """
    px = np.ascontiguousarray(rgb, dtype=np.uint8).reshape(height, width, 3)
    bpp = 3
    raw = px.reshape(height, width * bpp).astype(np.int16)
    lines = bytearray()
    prior = np.zeros(width * bpp, dtype=np.int16)
    for y in range(height):
        cur = raw[y]
        ftype = y % 5
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:  # Sub
            filt = cur - left
        elif ftype == 2:  # Up
            filt = cur - prior
        elif ftype == 3:  # Average
            filt = cur - (left + prior) // 2
        else:  # Paeth
            up_left = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
            pred = np.fromiter(
                (
                    _paeth(a, b, c)
                    for a, b, c in zip(
                        left.tolist(), prior.tolist(), up_left.tolist()
                    )
                ),
                dtype=np.int16,
                count=width * bpp,
            )
            filt = cur - pred
        lines.append(ftype)
        lines += (filt % 256).astype(np.uint8).tobytes()
        prior = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Parse an 8-bit RGB non-interlaced PNG: chunk walk (multiple IDATs
    concatenated, ancillary chunks skipped), stdlib ``zlib`` inflate,
    then the five scanline defilters including Paeth.  Anything beyond
    that profile (palette, alpha, 16-bit, interlaced) raises — the seam
    where a real codec library would plug in."""
    pos = len(_PNG_MAGIC)
    width = height = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    f"PNG depth={depth} color_type={color} interlace={interlace} "
                    "unsupported (8-bit RGB non-interlaced only)"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0 or not idat:
        raise ValueError("malformed PNG: missing IHDR or IDAT")
    bpp = 3
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"malformed PNG: {len(raw)} filtered bytes for {height}x{width}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line_start = y * (stride + 1)
        ftype = raw[line_start]
        filt = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=line_start + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = filt
        elif ftype == 2:  # Up — vectorizable, no intra-row dependency
            cur = (filt + prior) % 256
        elif ftype == 1:  # Sub — per-channel cumulative sum mod 256
            cur = (filt.reshape(-1, bpp).cumsum(axis=0) % 256).reshape(stride)
        elif ftype in (3, 4):  # Average/Paeth depend on the decoded left
            # pixel — inherently sequential; plain-int list loops beat
            # numpy scalar indexing ~10x here (profiled)
            f = filt.tolist()
            pr = prior.tolist()
            out_row: list[int] = [0] * stride
            if ftype == 3:
                for x in range(stride):
                    left = out_row[x - bpp] if x >= bpp else 0
                    out_row[x] = (f[x] + ((left + pr[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    left = out_row[x - bpp] if x >= bpp else 0
                    up = pr[x]
                    up_left = pr[x - bpp] if x >= bpp else 0
                    p = left + up - up_left
                    pa = abs(p - left)
                    pb = abs(p - up)
                    pc = abs(p - up_left)
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = up_left
                    out_row[x] = (f[x] + pred) & 255
            cur = np.array(out_row, dtype=np.int32)
        else:
            raise ValueError(f"malformed PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prior = cur
    return "png", width, height, out.reshape(height, width, 3)


def _decode_ppm(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Parse a binary PPM: whitespace/comment-tolerant header, then raw
    RGB.  Returns (fmt, width, height, pixels[h, w, 3])."""
    pos = 2  # past b"P6"
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raw data
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} unsupported (8-bit only)")
    n = width * height * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return "ppm", width, height, px.reshape(height, width, 3)


def _decode_bmp(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Parse a 24-bit uncompressed BMP: padded rows, bottom-up (positive
    height) or top-down (negative), BGR -> RGB."""
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    _, width, height, _, bpp, compression = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} unsupported "
            "(24-bit uncompressed only)"
        )
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)
    px = rows[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]  # BGR->RGB
    if not top_down:
        px = px[::-1]
    return "bmp", width, height, px


def decode_image(payload: bytes) -> tuple[str, int, int, float, float, float]:
    """Real decode of one image payload: (fmt, width, height, mean_r,
    mean_g, mean_b).  Channel means are exact-integer sums divided once
    in float64, so an analytic SQL oracle reproduces them bit-for-bit.
    """
    if payload[:2] == b"P6":
        fmt, w, h, px = _decode_ppm(payload)
    elif payload[:2] == b"BM":
        fmt, w, h, px = _decode_bmp(payload)
    elif payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        fmt, w, h, px = _decode_png(payload)
    elif payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        w, h, px = decode_jpeg(payload)
        fmt = "jpeg"
    else:
        raise NotImplementedError(
            f"unrecognized image format (magic {payload[:2]!r}); real decode "
            "owns PPM(P6) + BMP24 + 8-bit RGB PNG + baseline 4:4:4 JPEG — "
            "audio/video and exotic profiles stay the codec-library seam"
        )
    n = w * h
    sums = px.reshape(n, 3).sum(axis=0, dtype=np.int64)
    return fmt, w, h, float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n


# ---------------------------------------------------------------------------
# real audio codec: WAV (RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """16-bit PCM WAV: RIFF header + interleaved little-endian samples.
    ``samples`` is (n_frames, n_channels) int16."""
    pcm = np.ascontiguousarray(samples, dtype="<i2")
    if pcm.ndim != 2:
        raise ValueError("samples must be (n_frames, n_channels)")
    n_frames, n_ch = pcm.shape
    data = pcm.tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align, block_align, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 16-bit PCM WAV: RIFF chunk walk (unknown chunks skipped,
    word-aligned), fmt validation, samples back as (n_frames,
    n_channels) int16.  Compressed/float WAV raises — the codec-library
    seam, as for images."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing RIFF/WAVE header")
    pos = 12
    n_ch = sample_rate = bits = -1
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, n_ch, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format={audio_fmt} bits={bits} unsupported "
                    "(16-bit PCM only — compressed/float audio is the "
                    "codec-library seam)"
                )
        elif tag == b"data":
            if len(body) < length:
                raise ValueError(
                    f"malformed WAV: data chunk declares {length} bytes, "
                    f"only {len(body)} present (truncated payload)"
                )
            data = body
    if n_ch < 0 or data is None:
        raise ValueError("malformed WAV: missing fmt or data chunk")
    if len(data) % (n_ch * 2) != 0:
        raise ValueError(
            f"malformed WAV: {len(data)} data bytes are not a whole number "
            f"of {n_ch}-channel 16-bit frames"
        )
    pcm = np.frombuffer(data, dtype="<i2")
    return sample_rate, n_ch, pcm.reshape(-1, n_ch)


#: Output schema of the real audio-decode stage.
AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_channels int, n_frames int, rms double"
)


def synthesize_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic WAV payloads: doc ``i`` gets ``1 + i%2``
    channels and ``256 + (i%7)*64`` frames at 8 kHz, where frame ``s``
    channel ``c`` holds ``(i*37 + 5*(s*ch + c)) % 4096 - 2048`` — an
    integer formula a SQL oracle replays analytically, so the RIFF
    chunk walk + PCM layout are verified value-for-value."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                ch = 1 + i % 2
                n = 256 + (i % 7) * 64
                flat = (i * 37 + 5 * np.arange(n * ch)) % 4096 - 2048
                payloads.append(
                    encode_wav(8000, flat.astype(np.int16).reshape(n, ch))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched WAV decode: (sample_rate, n_channels, n_frames,
    rms).  RMS is an exact int64 sum of squares divided once in float64
    then sqrt — both engines' sqrt is correctly rounded, so the value is
    bit-reproducible."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                rate, n_ch, pcm = decode_wav(p)
                sq = np.square(pcm.astype(np.int64)).sum()
                rows.append(
                    (rate, n_ch, pcm.shape[0], float(np.sqrt(sq / pcm.size)))
                )
            out = pd.DataFrame(
                rows, columns=["sample_rate", "n_channels", "n_frames", "rms"]
            )
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=AUDIO_SCHEMA)


def synthesize_flac(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic COMPRESSED-audio payloads: the exact PCM formula of
    :func:`synthesize_audio` (doc ``i``: ``1 + i%2`` channels,
    ``256 + (i%7)*64`` frames at 8 kHz, sample ``(i*37 + 5*j) % 4096 -
    2048``) encoded as real FLAC streams (fixed-predictor rice frames,
    CRC-8/16, STREAMINFO MD5 — :mod:`.flaccodec`).  Sharing the formula
    is the verification design: the WAV face's analytic SQL oracle
    applies unchanged, so every bit-level stage of the FLAC decode has
    to reproduce the closed form or the hash breaks."""
    from . import flaccodec

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                ch = 1 + i % 2
                n = 256 + (i % 7) * 64
                flat = (i * 37 + 5 * np.arange(n * ch)) % 4096 - 2048
                payloads.append(
                    flaccodec.encode_flac(
                        8000, flat.astype(np.int16).reshape(n, ch)
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )


def decode_flac_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched FLAC decode to the WAV path's feature schema
    ``(sample_rate, n_channels, n_frames, rms)`` — rice/LPC/CRC bit
    plumbing in :mod:`.flaccodec`, RMS the same exact int64
    sum-of-squares + one float64 division + correctly-rounded sqrt."""
    from . import flaccodec

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                rate, n_ch, pcm = flaccodec.decode_flac(bytes(p))
                sq = np.square(pcm.astype(np.int64)).sum()
                rows.append(
                    (rate, n_ch, pcm.shape[0], float(np.sqrt(sq / pcm.size)))
                )
            out = pd.DataFrame(
                rows, columns=["sample_rate", "n_channels", "n_frames", "rms"]
            )
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=AUDIO_SCHEMA)


#: Output schema of the MP4 container-walk probe (one row per track).
MP4_SCHEMA = (
    "doc_id bigint, major_brand string, movie_timescale int, "
    "movie_duration int, n_tracks int, mdat_bytes int, track_idx int, "
    "handler string, codec string, timescale int, track_duration int, "
    "n_samples int, sample_bytes int"
)


def synthesize_mp4(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic ISO-BMFF payloads (``mp4box.build_mp4``): doc ``i``
    gets movie timescale 1000, duration ``1000 + (i%11)*500``, an
    ``avc1`` video track (timescale 30000, duration ``(2+i%11)*15000``,
    ``30 + i%7`` samples of ``1000 + i%50`` bytes) and, for odd ids, an
    ``mp4a`` audio track with PER-SAMPLE sizes ``100..100+n-1``
    (``50 + i%13`` samples — exercising the stsz table form; its byte
    total ``100n + n(n-1)/2`` is closed-form for the oracle)."""
    from . import mp4box

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                tracks = [
                    dict(
                        handler="vide",
                        codec="avc1",
                        timescale=30000,
                        duration=(2 + i % 11) * 15000,
                        n_samples=30 + i % 7,
                        sample_size=1000 + i % 50,
                    )
                ]
                if i % 2:
                    tracks.append(
                        dict(
                            handler="soun",
                            codec="mp4a",
                            timescale=8000,
                            duration=(1 + i % 5) * 8000,
                            n_samples=50 + i % 13,
                            sample_size=0,
                        )
                    )
                payloads.append(
                    mp4box.build_mp4(
                        1000, 1000 + (i % 11) * 500, tracks,
                        mdat=b"\x00" * (8 + i % 9),
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )


def probe_mp4(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched MP4 container walk (``mp4box.parse_mp4``): one row
    per track with movie + track metadata — codecs catalogued, sample
    tables totalled, ZERO coded bytes inspected.  This is the asset-
    inventory pass a curation pipeline runs over every clip before
    deciding what is worth sending to the (ffmpeg-seam) decoder."""
    from . import mp4box

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                info = mp4box.parse_mp4(bytes(p))
                for idx, t in enumerate(info.tracks):
                    rows.append(
                        (
                            int(i),
                            info.major_brand,
                            info.movie_timescale,
                            info.movie_duration,
                            len(info.tracks),
                            info.mdat_bytes,
                            idx,
                            t.handler,
                            t.codec,
                            t.timescale,
                            t.duration,
                            t.n_samples,
                            t.sample_bytes,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "major_brand", "movie_timescale",
                    "movie_duration", "n_tracks", "mdat_bytes", "track_idx",
                    "handler", "codec", "timescale", "track_duration",
                    "n_samples", "sample_bytes",
                ],
            )

    return df.mapInPandas(probe, schema=MP4_SCHEMA)


# ---------------------------------------------------------------------------
# video plumbing: a minimal MJPEG-style container + frame sampling
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"LFV1"


def encode_video(frames: list[bytes]) -> bytes:
    """Minimal motion-JPEG container: magic + frame count + length-
    prefixed JPEG frames.  Real pipelines would carry MP4/WebM here; the
    frame-sampling plumbing downstream is identical, and every frame is
    a REAL baseline JPEG from ``jpegcodec``."""
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack("<I", len(frames))
    for f in frames:
        out += struct.pack("<I", len(f))
        out += f
    return bytes(out)


def iter_video_frames(payload: bytes) -> list[bytes]:
    if payload[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            f"unrecognized video container (magic {payload[:4]!r}); real "
            "decode owns the LFV1 MJPEG container — MP4/WebM are the "
            "ffmpeg seam"
        )
    (n,) = struct.unpack_from("<I", payload, 4)
    pos = 8
    frames = []
    for _ in range(n):
        if pos + 4 > len(payload):
            raise ValueError("malformed LFV1: truncated frame table")
        (length,) = struct.unpack_from("<I", payload, pos)
        if pos + 4 + length > len(payload):
            raise ValueError("malformed LFV1: truncated frame stream")
        frames.append(payload[pos + 4 : pos + 4 + length])
        pos += 4 + length
    return frames


def synthesize_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic clips: doc ``i`` gets ``2 + i%4`` JPEG
    frames of the (4 + i%13) x (3 + i%7) analytic image with a per-frame
    offset (``i*31 + f*97``), so every sampled frame's expected decode
    is precomputable by the encoder-side reconstruction."""
    from .jpegcodec import encode_jpeg

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 4 + i % 13, 3 + i % 7
                frames = []
                for f in range(2 + i % 4):
                    vals = ((i * 31 + f * 97 + np.arange(w * h * 3)) % 256).astype(
                        np.uint8
                    )
                    frames.append(encode_jpeg(w, h, vals))
                payloads.append(encode_video(frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )


#: Output schema of the frame-sampling stage.
FRAME_SCHEMA = (
    "doc_id bigint, frame_id int, n_frames int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 2,
) -> DataFrame:
    """Frame sampling — the canonical video-pipeline step: decode every
    ``every_k``-th frame of each clip (REAL JPEG decode per frame) and
    emit per-frame features; the skipped frames' bytes are never
    decoded.  One Arrow-batched crossing, no shuffle; at 100 TB the
    payload column is pruned unless this stage runs and only kilobytes
    of features continue downstream."""
    if every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    from .jpegcodec import decode_jpeg

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                frames = iter_video_frames(p)
                for f in range(0, len(frames), every_k):
                    w, h, px = decode_jpeg(frames[f])
                    n = w * h
                    sums = px.reshape(n, 3).sum(axis=0, dtype=np.int64)
                    rows.append(
                        (
                            int(doc_id), f, len(frames), w, h,
                            float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_id", "n_frames", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


def _encode_jpeg(width: int, height: int, rgb: np.ndarray) -> bytes:
    from .jpegcodec import encode_jpeg

    return encode_jpeg(width, height, rgb)


_ENCODERS = {
    "ppm": encode_ppm,
    "bmp": encode_bmp24,
    "png": encode_png,
    "jpeg": _encode_jpeg,
}


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", formats: tuple[str, ...] = ("ppm", "bmp")
) -> DataFrame:
    """Deterministic synthetic image payloads for codec verification:
    doc ``i`` gets a (4 + i%13) x (3 + i%7) image whose raster-order
    pixel ``p`` has channels ((i*31 + 3p + c) % 256), written in
    container ``formats[i % len(formats)]`` — default PPM for even ids
    and BMP for odd, so the decode side must parse real container
    layouts (padding, bottom-up rows, BGR, or PNG's filtered+deflated
    scanlines) to recover the same analytic pixel stats."""
    unknown = [f for f in formats if f not in _ENCODERS]
    if unknown:
        raise ValueError(f"unknown synth formats {unknown}; pick from {sorted(_ENCODERS)}")

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()  # aliased below, whatever id_col was
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 4 + i % 13, 3 + i % 7
                vals = ((i * 31 + np.arange(w * h * 3)) % 256).astype(np.uint8)
                enc = _ENCODERS[formats[i % len(formats)]]
                payloads.append(enc(w, h, vals))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        synth, schema="doc_id bigint, payload binary"
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """Arrow-batched decode of a binary payload column.

    ``real=True`` parses PPM(P6)/BMP24/PNG-RGB8/baseline-JPEG payloads
    with the pure-Python decoders (other formats raise — that seam is
    where PIL/ffmpeg/soundfile would plug in); ``real=False`` runs the
    deterministic fake decoder.  Audio takes :func:`decode_audio`,
    video clips :func:`sample_video_frames`.
    """
    if real:

        def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                decoded = [decode_image(p) for p in pdf[payload_col]]
                out = pd.DataFrame(
                    decoded,
                    columns=["fmt", "width", "height", "mean_r", "mean_g", "mean_b"],
                )
                out.insert(0, "doc_id", pdf[id_col].to_numpy())
                yield out

        return df.mapInPandas(decode_real, schema=DECODE_REAL_SCHEMA)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "fake_width", "fake_height", "fake_frames"]
            )
            out.insert(0, "doc_id", pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(decode, schema=DECODE_SCHEMA)


def _decode_rgb(payload: bytes) -> tuple[str, int, int, np.ndarray]:
    """Raw-pixel dispatch shared by :func:`decode_image` and the resize
    path (decode_image collapses to channel means; resize needs px)."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        w, h, px = decode_jpeg(payload)
        return "jpeg", w, h, px
    raise NotImplementedError(
        f"unrecognized image format (magic {payload[:2]!r})"
    )


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) pixel array: output pixel
    (i, j) takes source pixel ``(i*h // out_h, j*w // out_w)`` — the
    integer-exact mapping an analytic oracle can replay (and the same
    index formula PIL's NEAREST uses up to its +0.5 center offset,
    which we deliberately omit to keep the arithmetic integer-only)."""
    h, w = px.shape[:2]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[rows][:, cols]


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_h: int = 3,
    out_w: int = 3,
) -> DataFrame:
    """The vision-pipeline step after decode: Arrow-batched decode →
    nearest-neighbor resize to (out_h, out_w) → exact per-channel means
    of the RESIZED image.

    Output ``(id, fmt, width, height, mean_r, mean_g, mean_b)`` where
    width/height are the SOURCE dims (the resize target is the
    operator's parameter, not data).  Channel means are exact integer
    sums over out_h*out_w pixels divided once in float64 — analytic
    SQL oracles replay them bit-for-bit, like ``decode_image``.  At
    100 TB this is the thumbnail/model-input-prep crossing: one
    mapInPandas, payload bytes never shuffle.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                fmt, w, h, px = _decode_rgb(bytes(payload))
                small = resize_nearest(px, out_h, out_w)
                n = out_h * out_w
                sums = small.reshape(n, 3).sum(axis=0, dtype=np.int64)
                rows.append(
                    (
                        fmt,
                        w,
                        h,
                        float(sums[0]) / n,
                        float(sums[1]) / n,
                        float(sums[2]) / n,
                    )
                )
            out = pd.DataFrame(
                rows, columns=["fmt", "width", "height", "mean_r", "mean_g", "mean_b"]
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.mapInPandas(work, schema=DECODE_REAL_SCHEMA)


def audio_frame_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_window: int = 128,
) -> DataFrame:
    """Windowed audio features — the VAD/loudness-segmentation
    primitive: decode once, then per ``frame_window``-frame window emit
    ``(id, window_idx, n_frames_win, rms)``.  The tail window keeps its
    true (shorter) frame count instead of padding — silence-padding an
    RMS biases it low.

    Same exactness contract as :func:`decode_audio`: int64
    sum-of-squares per window, ONE float64 division, correctly-rounded
    sqrt — analytic SQL oracles replay it bit-for-bit.  One Arrow
    crossing; windows of one payload never split across tasks.
    """
    if frame_window < 1:
        raise ValueError(f"frame_window must be >= 1, got {frame_window}")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, nfr, rms = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                rate, n_ch, pcm = decode_wav(p)
                n = pcm.shape[0]
                for k in range((n + frame_window - 1) // frame_window):
                    seg = pcm[k * frame_window : (k + 1) * frame_window]
                    sq = np.square(seg.astype(np.int64)).sum()
                    ids.append(i)
                    wins.append(k)
                    nfr.append(seg.shape[0])
                    rms.append(float(np.sqrt(sq / seg.size)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "window_idx": wins,
                    "n_frames_win": nfr,
                    "rms": rms,
                }
            )

    return df.mapInPandas(
        work, schema=f"`{id_col}` bigint, window_idx int, n_frames_win int, rms double"
    )


def detect_scene_cuts(
    frames: DataFrame,
    id_col: str = "doc_id",
    frame_col: str = "frame_id",
    threshold: float = 30.0,
) -> DataFrame:
    """Scene-cut detection over sampled frames — the first thing a video
    curation pipeline computes after frame extraction (shot boundaries
    segment clips for captioning/training).

    Input is :func:`sample_video_frames` output (per-frame channel
    means); the cut signal is the L1 distance between consecutive
    sampled frames' means, flagged where it exceeds ``threshold``.  A
    clip's first frame is never a cut (no predecessor).  One LAG window
    per clip — key-partitioned, stream-friendly, replayable in SQL.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(frame_col)
    diff = F.round(
        F.abs(F.col("mean_r") - F.lag("mean_r").over(w))
        + F.abs(F.col("mean_g") - F.lag("mean_g").over(w))
        + F.abs(F.col("mean_b") - F.lag("mean_b").over(w)),
        6,
    )
    return frames.select(
        id_col,
        frame_col,
        diff.alias("frame_diff"),
        F.coalesce(diff > F.lit(threshold), F.lit(False)).alias("is_cut"),
    )
