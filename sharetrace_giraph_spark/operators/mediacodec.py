"""Minimal real media codecs — pure stdlib + numpy, zero native deps.

Round-5 closure of the "multimodal decode is a stub" gap: the container
ships no PIL/cv2/libav, but three widely-used container formats are
fully decodable with what IS here (zlib, struct, wave, numpy):

- **PNG** (RFC 2083 / ISO 15948): 8-bit grayscale / gray+alpha / RGB /
  RGBA, non-interlaced, all five scanline filters (None/Sub/Up/
  Average/Paeth). The encoder emits filter-0 scanlines; the decoder
  handles any conforming filter sequence.
- **Netpbm** P5 (PGM, grayscale) / P6 (PPM, RGB), binary, maxval 255.
- **WAV** PCM16 mono/stereo via the stdlib ``wave`` module.

When PIL/Pillow IS importable, :func:`decode_media` prefers it for PNG
and non-built-in formats (JPEG etc.); netpbm ALWAYS uses the built-in
decoder — PIL's raster anchoring silently shifts CRLF-header files, and
netpbm must decode identically in every environment. These built-ins
are the dependency-free floor that keeps the real-decode path
exercisable anywhere.

Encoders exist so tests can round-trip pixel-exactly without fixture
binaries. Not supported (by design, this is a floor not a library):
16-bit channels, palettes, interlacing, non-PCM audio — those raise
``UnsupportedMediaError`` with the reason, never a silent wrong decode.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

try:  # probed ONCE: Python does not cache failed imports, and decode_media
    # runs per payload inside Arrow batches — a per-row sys.path scan when
    # PIL is absent would be pure hot-path overhead
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> channel count (8-bit only; 3 = palette, unsupported)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
#: decompression cap for untrusted payloads: a ~40 KB zip-bomb PNG whose
#: header declares matching giant dimensions must quarantine, not OOM the
#: executor (256 MiB of raw scanlines ≈ an 8k×8k RGBA frame — far above
#: any sane inline payload, far below executor memory)
_MAX_DECODED_BYTES = 1 << 28


class UnsupportedMediaError(ValueError):
    """Payload is recognized but uses a feature outside the minimal
    codec floor (or is not recognized at all)."""


# --- PNG ---------------------------------------------------------------------


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an 8-bit image array to a conforming PNG (filter 0 rows).

    ``arr``: (h, w) grayscale, or (h, w, c) with c in {2, 3, 4}.
    """
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise UnsupportedMediaError(f"unsupported channel count {c}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG filter 4), vectorized over a scanline."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w) or (h, w, c) uint8."""
    if not data.startswith(_PNG_SIG):
        raise UnsupportedMediaError("not a PNG (bad signature)")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            if len(body) != 13:
                raise UnsupportedMediaError("truncated PNG IHDR")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise UnsupportedMediaError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise UnsupportedMediaError(f"only 8-bit PNG supported (got {depth})")
    if color_type not in _PNG_CHANNELS:
        raise UnsupportedMediaError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise UnsupportedMediaError("interlaced PNG unsupported")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    expected = h * (stride + 1)
    if expected > _MAX_DECODED_BYTES:
        raise UnsupportedMediaError(
            f"PNG dimensions {w}x{h}x{c} exceed the built-in decoder cap"
        )
    try:
        # bounded decompress: request at most expected+1 bytes so a
        # decompression bomb raises here instead of exhausting memory
        raw = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:  # valid signature, corrupt IDAT stream
        raise UnsupportedMediaError(f"corrupt PNG IDAT: {exc}") from exc
    if len(raw) != expected:
        raise UnsupportedMediaError("PNG scanline data has wrong length")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = line
            left = np.zeros(c, dtype=np.uint8)
            for x in range(0, stride, c):
                px = cur[x : x + c]
                up = prev[x : x + c]
                ul = (
                    prev[x - c : x] if x >= c else np.zeros(c, dtype=np.uint8)
                )
                if ftype == 1:
                    px += left
                elif ftype == 3:
                    px += ((left.astype(np.int16) + up.astype(np.int16)) // 2).astype(
                        np.uint8
                    )
                else:
                    px += _paeth(left, up, ul)
                left = px
        else:
            raise UnsupportedMediaError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# --- Netpbm (P5/P6) ----------------------------------------------------------


def encode_netpbm(arr: np.ndarray) -> bytes:
    """Encode (h, w) uint8 as binary PGM (P5) or (h, w, 3) as PPM (P6)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise UnsupportedMediaError("netpbm supports gray or RGB only")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_netpbm(data: bytes) -> np.ndarray:
    """Decode binary PGM (P5) / PPM (P6), maxval <= 255."""
    if data[:2] not in (b"P5", b"P6"):
        raise UnsupportedMediaError("not a binary netpbm (P5/P6)")
    channels = 1 if data[:2] == b"P5" else 3
    try:
        # header: magic, width, height, maxval — whitespace/comment separated
        tokens, pos = [], 2
        while len(tokens) < 3:
            while pos < len(data) and data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(data) and data[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(data[start:pos]))
        pos += 1  # the single whitespace delimiter after maxval (spec)
        w, h, maxval = tokens
        if maxval > 255:
            raise UnsupportedMediaError("16-bit netpbm unsupported")
        n = w * h * channels
        # Raster anchoring. Spec: the raster starts at the byte after
        # the single maxval delimiter (`pos`), and we tolerate only
        # trailing WHITESPACE (writers commonly append a final newline).
        # An END-anchored read (len(data) - n) would silently decode
        # byte-shifted pixels for exactly those trailing-newline files
        # whenever the first pixel value happens to be whitespace.
        # One wrinkle: a CRLF-terminated header ("255\r\n", common
        # nonconforming two-byte delimiter) is byte-identical to a
        # bare-CR-delimited header whose first pixel is \n (10) — so
        # when the delimiter was \r and the next byte is \n, BOTH
        # candidate starts are checked against the payload size and a
        # file where both fit is rejected as ambiguous rather than
        # silently decoded one byte off in either direction (the
        # module's never-a-silent-wrong-decode contract).
        candidates = [pos]
        if data[pos - 1 : pos] == b"\r" and data[pos : pos + 1] == b"\n":
            candidates.append(pos + 1)
        starts = [
            p
            for p in candidates
            if len(data) - p >= n and data[p + n :].strip() == b""
        ]
        if not starts:
            raise UnsupportedMediaError("netpbm raster size mismatch")
        if len(starts) > 1:
            raise UnsupportedMediaError(
                "ambiguous netpbm raster start (CR vs CRLF header delimiter)"
            )
        arr = np.frombuffer(data, dtype=np.uint8, count=n, offset=starts[0])
        return arr.reshape((h, w) if channels == 1 else (h, w, 3)).copy()
    except UnsupportedMediaError:
        raise
    except (ValueError, IndexError) as exc:
        # valid P5/P6 magic but a truncated/garbled header or body:
        # int(b"") on a header that runs out, or frombuffer/reshape on a
        # payload shorter than w*h*channels
        raise UnsupportedMediaError(f"corrupt netpbm payload: {exc}") from exc


# --- WAV (PCM16) -------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples ((n,) mono or (n, 2) stereo) as PCM16 WAV."""
    a = np.ascontiguousarray(samples, dtype=np.int16)
    n_channels = 1 if a.ndim == 1 else a.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(n_channels)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV; returns (samples int16 (n,) or (n, ch), rate)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as f:
            if f.getsampwidth() != 2:
                raise UnsupportedMediaError("only PCM16 WAV supported")
            n_ch = f.getnchannels()
            rate = f.getframerate()
            raw = f.readframes(f.getnframes())
    except (wave.Error, EOFError, struct.error) as exc:
        # wave's chunk parser surfaces EOFError/struct.error on payloads
        # truncated mid-header — same data-error class as wave.Error
        raise UnsupportedMediaError(f"not a readable WAV: {exc}") from exc
    arr = np.frombuffer(raw, dtype=np.int16)
    return (arr if n_ch == 1 else arr.reshape(-1, n_ch)).copy(), rate


# --- dispatcher --------------------------------------------------------------


def _pil_decode(payload: bytes) -> np.ndarray | None:
    """Best-effort PIL decode; ``None`` when PIL is absent OR cannot
    parse the payload (UnidentifiedImageError, truncation, ...) — the
    caller falls through to the built-in floor / the quarantine error.
    Never lets a PIL exception escape: the quarantine contract must not
    depend on which optional decoder is installed."""
    if _PILImage is None:
        return None
    try:
        with _PILImage.open(io.BytesIO(payload)) as im:
            # condition to the documented uint8 contract: palette/1-bit/
            # CMYK/YCbCr convert losslessly-enough to 8-bit channels;
            # 16/32-bit depths fall through to the built-in floor (which
            # rejects them loudly) rather than silently truncating —
            # np.asarray on a raw "P" image would return palette INDICES,
            # a silent wrong decode that differs by installed decoder
            if im.mode in ("P", "1", "CMYK", "YCbCr"):
                im = im.convert("RGBA" if "transparency" in im.info else "RGB")
            elif im.mode not in ("L", "LA", "RGB", "RGBA"):
                return None
            arr = np.asarray(im)
            return arr if arr.dtype == np.uint8 else None
    except Exception:
        return None


def decode_media(payload: bytes) -> tuple[str, np.ndarray]:
    """Sniff and decode a media payload.

    Returns ``(kind, array)``: kind ``"image"`` with a uint8 pixel array,
    or ``"audio"`` with an int16 sample array. Prefers PIL, when
    importable, for PNG and non-built-in formats (JPEG/WebP/...);
    netpbm always decodes via the built-in (see the module docstring).
    Raises :class:`UnsupportedMediaError` for anything
    else — including corrupt payloads behind a valid signature — a data
    error the caller routes to a quarantine column, never a stubbed
    NotImplementedError or a raw codec exception."""
    if payload.startswith(_PNG_SIG):
        img = _pil_decode(payload)  # optional fast path, same pixels
        if img is not None:
            return "image", img
        return "image", decode_png(payload)
    if payload[:2] in (b"P5", b"P6"):
        # built-in ONLY, even when PIL is installed: PIL anchors the
        # raster at the byte after the maxval delimiter unconditionally,
        # so a CRLF-header (or ambiguous bare-CR) file decodes silently
        # one byte shifted there — the same-result-in-every-environment
        # / never-a-silent-wrong-decode contract outweighs PIL's extra
        # netpbm variants (plain P2/P3, 16-bit), which now quarantine
        # identically everywhere instead of decoding only where PIL
        # happens to exist
        return "image", decode_netpbm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio", decode_wav(payload)[0]
    # non-PNG/netpbm image formats (JPEG etc.) when PIL is present
    img = _pil_decode(payload)
    if img is not None:
        return "image", img
    raise UnsupportedMediaError(
        "payload is not a decodable format (PNG/PGM/PPM/WAV built-in"
        "; more via PIL when installed)"
    )
