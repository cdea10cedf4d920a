"""Unit tests for the dependency-free media codec floor (round 5).

No Spark session needed — pure numpy/stdlib, so these run in
milliseconds and pin the byte-level contracts: pixel-exact PNG
round-trip, decode of all five PNG scanline filters (encoded by hand,
since our encoder only emits filter 0), netpbm and WAV round-trips, and
loud UnsupportedMediaError on everything outside the floor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sharetrace_giraph_spark.operators.mediacodec import (
    UnsupportedMediaError,
    decode_media,
    decode_netpbm,
    decode_png,
    decode_wav,
    encode_netpbm,
    encode_png,
    encode_wav,
)


def _rng_img(h, w, c=None, seed=7):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [None, 2, 3, 4])
def test_png_roundtrip_pixel_exact(channels):
    img = _rng_img(13, 17, channels)
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_png_all_filter_types_decode():
    """Hand-encode one scanline per filter type (the inverse transforms
    from the PNG spec) and check the decoder reconstructs the image."""
    img = _rng_img(5, 9, 3, seed=11)
    h, w, c = img.shape
    stride = w * c

    rows = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = img[y].reshape(-1)
        ftype = y % 5
        if ftype == 0:
            enc = cur.copy()
        elif ftype == 1:  # Sub
            left = np.concatenate([np.zeros(c, np.uint8), cur[:-c]])
            enc = cur - left
        elif ftype == 2:  # Up
            enc = cur - prev
        elif ftype == 3:  # Average
            left = np.concatenate([np.zeros(c, np.uint8), cur[:-c]])
            enc = cur - (
                (left.astype(np.int16) + prev.astype(np.int16)) // 2
            ).astype(np.uint8)
        else:  # Paeth
            left = np.concatenate([np.zeros(c, np.uint8), cur[:-c]])
            ul = np.concatenate([np.zeros(c, np.uint8), prev[:-c]])
            a16, b16, c16 = (
                left.astype(np.int16),
                prev.astype(np.int16),
                ul.astype(np.int16),
            )
            p = a16 + b16 - c16
            pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            ).astype(np.uint8)
            enc = cur - pred
        rows.append(bytes([ftype]) + enc.tobytes())
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


@pytest.mark.parametrize("channels", [None, 3])
def test_netpbm_roundtrip(channels):
    img = _rng_img(6, 4, channels)
    assert np.array_equal(decode_netpbm(encode_netpbm(img)), img)


@pytest.mark.parametrize("stereo", [False, True])
def test_wav_roundtrip(stereo):
    rng = np.random.default_rng(3)
    shape = (500, 2) if stereo else (500,)
    samples = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, sample_rate=8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_decode_media_dispatch():
    img = _rng_img(4, 4, 3)
    kind, arr = decode_media(encode_png(img))
    assert kind == "image" and np.array_equal(arr, img)
    kind, arr = decode_media(encode_netpbm(img))
    assert kind == "image" and np.array_equal(arr, img)
    tone = (1000 * np.sin(np.arange(64) / 3.0)).astype(np.int16)
    kind, arr = decode_media(encode_wav(tone))
    assert kind == "audio" and np.array_equal(arr, tone)


@pytest.mark.parametrize(
    "payload",
    [
        b"plain text, no magic",
        b"\x89PNG\r\n\x1a\nbut-truncated",
        b"RIFFxxxxWAVEnot-really",
    ],
)
def test_unsupported_payloads_raise(payload):
    with pytest.raises(UnsupportedMediaError):
        decode_media(payload)


def test_png_16bit_rejected_not_misdecoded():
    img = _rng_img(3, 3)
    data = bytearray(encode_png(img))
    # flip the IHDR bit-depth byte (offset: 8 sig + 8 len/tag + 8 w/h)
    assert data[24] == 8
    data[24] = 16
    # fix the IHDR crc so only the depth is wrong
    body = bytes(data[16:29])
    data[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(UnsupportedMediaError, match="8-bit"):
        decode_png(bytes(data))


@pytest.mark.parametrize(
    "payload",
    [
        # valid PNG signature + well-formed IHDR, but IDAT is not zlib
        pytest.param(
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0) + b"\x00" * 4
            + struct.pack(">I", 7) + b"IDAT" + b"garbage" + b"\x00" * 4
            + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4,
            id="png-corrupt-idat",
        ),
        # valid PNG signature, IHDR body shorter than 13 bytes
        pytest.param(
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 4) + b"IHDR" + b"\x00" * 8,
            id="png-short-ihdr",
        ),
        # bare netpbm magic: header parse hits int(b"")
        pytest.param(b"P5", id="netpbm-bare-magic"),
        # netpbm header ok but body shorter than w*h
        pytest.param(b"P5\n4 4\n255\nxy", id="netpbm-truncated-body"),
        # RIFF/WAVE magic, truncated mid-header (wave raises EOFError)
        pytest.param(b"RIFF\x24\x00\x00\x00WAVEfmt ", id="wav-truncated-header"),
    ],
)
def test_corrupt_payloads_behind_valid_magic_quarantine(payload):
    """The quarantine contract: a corrupt payload behind a VALID format
    signature must surface as UnsupportedMediaError (which
    extract_features(decode=True) routes to the error column), never a
    raw zlib.error/struct.error/ValueError/EOFError that would fail the
    whole Spark task."""
    with pytest.raises(UnsupportedMediaError):
        decode_media(payload)


def test_png_decompression_bomb_quarantines_not_ooms():
    """A tiny payload whose header declares giant dimensions (the
    zip-bomb shape) must raise UnsupportedMediaError via the decode cap,
    never attempt to materialize gigabytes."""
    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 6, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    body = zlib.compress(b"\x00" * 65536)  # highly compressible
    bomb += struct.pack(">I", len(body)) + b"IDAT" + body + b"\x00" * 4
    bomb += struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
    with pytest.raises(UnsupportedMediaError, match="cap"):
        decode_media(bomb)


def test_netpbm_crlf_header_decodes_unshifted():
    """A CRLF-terminated netpbm header must decode the SAME pixels as the
    LF-terminated one (the two-byte line ending is ONE delimiter), not
    silently shift every byte; a raster size mismatch must raise."""
    img = _rng_img(4, 4)
    canonical = encode_netpbm(img)
    header, raster = canonical.split(b"\n255\n")
    crlf = header + b"\n255\r\n" + raster
    kind, arr = decode_media(crlf)
    assert kind == "image" and np.array_equal(arr, img)
    with pytest.raises(UnsupportedMediaError, match="mismatch"):
        decode_media(header + b"\n255\n" + raster[:-1])  # one byte short


def test_netpbm_trailing_newline_whitespace_pixel_decodes_unshifted():
    """The adversarial case for END-anchored raster reads: a conforming
    file with one trailing newline whose FIRST pixel value is itself
    whitespace (32). End-anchoring would land one byte past the true
    raster start, see the whitespace-valued first pixel as 'gap between
    header and raster', and silently decode every pixel shifted by one —
    spec-anchoring at the header position decodes it exactly."""
    img = np.arange(32, 48, dtype=np.uint8).reshape(4, 4)  # pixel[0] = 32 = b" "
    for tail in (b"\n", b"\r\n", b"  \n"):
        kind, arr = decode_media(encode_netpbm(img) + tail)
        assert kind == "image" and np.array_equal(arr, img), tail
    # trailing NON-whitespace garbage is still a loud mismatch
    with pytest.raises(UnsupportedMediaError, match="mismatch"):
        decode_media(encode_netpbm(img) + b"\nx")
    # RGB variant: first pixel triple starts with \t (9)
    rgb = np.full((2, 2, 3), 9, dtype=np.uint8)
    kind, arr = decode_media(encode_netpbm(rgb) + b"\n")
    assert kind == "image" and np.array_equal(arr, rgb)


def test_netpbm_bare_cr_delimiter_decodes_or_raises_never_shifts():
    """A bare CR is a valid single-whitespace maxval delimiter. With a
    first pixel of \\n (10) the bytes are identical to a CRLF-delimited
    header — when only ONE reading fits the payload size, decode that
    one; when BOTH fit, refuse loudly instead of guessing (a guess is a
    silent one-byte shift under whichever writer produced the file)."""
    img = np.array([[10, 7], [7, 7]], dtype=np.uint8)  # pixel[0] = 10 = b"\n"
    raster = img.tobytes()
    # bare-CR delimiter, exact size: only the CR reading fits -> decode
    kind, arr = decode_media(b"P5\n2 2\n255\r" + raster)
    assert kind == "image" and np.array_equal(arr, img)
    # trailing newline makes BOTH readings fit -> ambiguous, refuse
    with pytest.raises(UnsupportedMediaError, match="ambiguous"):
        decode_media(b"P5\n2 2\n255\r" + raster + b"\n")
    # a normal CRLF file (first pixel not forming a second valid fit)
    # still decodes via the CRLF reading
    img2 = np.array([[10, 7], [7, 8]], dtype=np.uint8)
    kind, arr = decode_media(b"P5\n2 2\n255\r\n" + img2.tobytes())
    assert kind == "image" and np.array_equal(arr, img2)
