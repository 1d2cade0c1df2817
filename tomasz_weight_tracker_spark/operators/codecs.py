"""Pure-stdlib media codecs: BMP + PNG (image) and WAV/PCM (audio).

Real decoders — no external libraries — so the multimodal pipeline has
a genuinely exercised decode path in this container (Pillow/soundfile
are absent).  The formats are simple enough that a header-struct +
sample-array parse IS the reference decode:

- BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (``struct`` little-endian),
  uncompressed 24-bit pixel rows (bottom-up, 4-byte row padding).
- PNG: chunk walk (IHDR/IDAT/IEND), stdlib ``zlib`` inflate, and the
  full per-scanline unfilter (None/Sub/Up/Average/Paeth) for 8-bit
  gray / gray+alpha / RGB / RGBA, non-interlaced.
- WAV: RIFF chunk walk to ``fmt `` / ``data``, 16-bit PCM samples.

Parsers return ``None`` for anything that doesn't validate, so the
caller can fall through to other decoders — corrupt blobs are data,
not exceptions (same tolerance posture as the corrupt-document scan).
"""

from __future__ import annotations

import struct
import zlib


def parse_bmp(raw: bytes) -> dict | None:
    """Decode a BMP header (+ pixels when uncompressed 24-bit).

    Returns {width, height, bpp, pixels} where ``pixels`` is a list of
    (b, g, r) tuples in row-major top-down order, or None for
    compressed/deep formats (header-only decode still returns dims).
    """
    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    try:
        data_offset = struct.unpack_from("<I", raw, 10)[0]
        dib_size = struct.unpack_from("<I", raw, 14)[0]
        if dib_size < 40:  # BITMAPCOREHEADER not supported
            return None
        width, height = struct.unpack_from("<ii", raw, 18)
        planes, bpp = struct.unpack_from("<HH", raw, 26)
        compression = struct.unpack_from("<I", raw, 30)[0]
    except struct.error:
        return None
    if width <= 0 or height == 0 or planes != 1:
        return None
    top_down = height < 0
    abs_h = abs(height)
    out = {"width": width, "height": abs_h, "bpp": bpp, "pixels": None}
    if bpp != 24 or compression != 0:
        return out  # header-only decode
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    if data_offset + row_stride * abs_h > len(raw):
        return None
    pixels: list[tuple[int, int, int]] = []
    rows = range(abs_h) if top_down else range(abs_h - 1, -1, -1)
    for row in rows:
        base = data_offset + row * row_stride
        for x in range(width):
            off = base + 3 * x
            pixels.append((raw[off], raw[off + 1], raw[off + 2]))
    out["pixels"] = pixels
    return out


PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels per PNG color type (palette images need a PLTE decode this
# container has no consumer for — they fall back to header-only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
# Pixel-decode ceiling: the header's w*h is UNTRUSTED, and both the
# inflate and the per-pixel Python loop are O(w*h).  A 64 MP cap keeps
# a crafted IHDR (or an IDAT decompression bomb — see parse_png's
# bounded decompressobj) from pinning an executor; real blobs above
# the cap still get the header-only decode.
_PNG_MAX_PIXELS = 1 << 26


def parse_png(raw: bytes) -> dict | None:
    """Decode a PNG: IHDR header always; full pixels for 8-bit-depth
    gray / gray+alpha / RGB / RGBA, non-interlaced (inflate + the five
    scanline unfilters).  Returns the same shape as :func:`parse_bmp` —
    {width, height, bpp, pixels} with ``pixels`` row-major top-down
    (b, g, r) tuples (gray replicated across channels; alpha dropped) —
    so the downstream feature extractors are codec-agnostic.  Unsupported
    variants (16-bit, palette, interlaced) decode header-only
    (``pixels=None``); anything malformed returns None.
    """
    if len(raw) < 8 or raw[:8] != PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(raw):
        try:
            ln = struct.unpack_from(">I", raw, pos)[0]
        except struct.error:
            return None
        ctype = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            return None
        if ctype == b"IHDR":
            if ln < 13:
                return None
            ihdr = struct.unpack_from(">IIBBBBB", body, 0)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + crc
    if ihdr is None:
        return None
    w, h, depth, color_type, comp, filt, interlace = ihdr
    channels = _PNG_CHANNELS.get(color_type)
    if w <= 0 or h <= 0 or comp != 0 or filt != 0:
        return None
    out = {
        "width": w,
        "height": h,
        "bpp": depth * (channels or 1),
        "pixels": None,
    }
    if depth != 8 or channels is None or interlace != 0 or not idat:
        return out  # header-only decode
    if w * h > _PNG_MAX_PIXELS:
        return out  # untrusted geometry too large for pixel decode
    stride = w * channels
    expected = h * (1 + stride)
    try:
        # Bound inflation by the raster size the header promised: a
        # crafted IDAT that inflates past w*h (decompression bomb)
        # stops at expected+1 bytes instead of filling executor memory.
        dec = zlib.decompressobj()
        data = dec.decompress(bytes(idat), expected + 1)
    except zlib.error:
        return out
    if len(data) != expected or dec.decompress(b"", 1):
        return out  # truncated or oversized raster: keep header decode
    pixels: list[tuple[int, int, int]] = []
    prev = bytearray(stride)
    dp = 0
    for _y in range(h):
        ft = data[dp]
        dp += 1
        row = bytearray(data[dp : dp + stride])
        dp += stride
        if ft == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            return out  # unknown filter byte: keep the header decode
        prev = row
        for x in range(w):
            o = x * channels
            if channels <= 2:  # gray / gray+alpha
                v = row[o]
                pixels.append((v, v, v))
            else:  # RGB / RGBA scanline order is R,G,B[,A]
                pixels.append((row[o + 2], row[o + 1], row[o]))
    out["pixels"] = pixels
    return out


def parse_wav(raw: bytes) -> dict | None:
    """Decode a WAV header (+ samples when 16-bit PCM).

    Returns {n_channels, sample_rate, bits_per_sample, n_frames,
    duration_ms, samples} with ``samples`` a flat list of ints
    (interleaved channels) for 16-bit PCM, else None samples.
    """
    if len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        chunk_id = raw[pos : pos + 4]
        try:
            chunk_size = struct.unpack_from("<I", raw, pos + 4)[0]
        except struct.error:
            return None
        body = raw[pos + 8 : pos + 8 + chunk_size]
        if chunk_id == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif chunk_id == b"data":
            data = body
        pos += 8 + chunk_size + (chunk_size & 1)  # chunks pad to even
    if fmt is None or data is None:
        return None
    audio_format, n_channels, sample_rate, _rate, block_align, bits = fmt
    if n_channels == 0 or sample_rate == 0 or block_align == 0:
        return None
    n_frames = len(data) // block_align
    out = {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "samples": None,
    }
    if audio_format == 1 and bits == 16:
        n = (len(data) // 2) * 2
        out["samples"] = list(struct.unpack(f"<{n // 2}h", data[:n]))
    return out


def bmp_features(decoded: dict, dim: int) -> list[float] | None:
    """Real image features from decoded BMP pixels: per-channel means
    (R, G, B), luma mean, and a 4-bin luma histogram — all in [0, 1]."""
    pixels = decoded.get("pixels")
    if not pixels:
        return None
    n = len(pixels)
    sum_b = sum(p[0] for p in pixels)
    sum_g = sum(p[1] for p in pixels)
    sum_r = sum(p[2] for p in pixels)
    lumas = [(2126 * p[2] + 7152 * p[1] + 722 * p[0]) // 10000 for p in pixels]
    hist = [0, 0, 0, 0]
    for v in lumas:
        hist[min(v >> 6, 3)] += 1
    feats = [
        sum_r / n / 255.0,
        sum_g / n / 255.0,
        sum_b / n / 255.0,
        sum(lumas) / n / 255.0,
        *[h / n for h in hist],
    ]
    return (feats + [0.0] * dim)[:dim]


def wav_features(decoded: dict, dim: int) -> list[float] | None:
    """Real audio features from 16-bit PCM samples: normalized mean
    absolute amplitude, RMS, zero-crossing rate, peak — in [0, 1]."""
    samples = decoded.get("samples")
    if not samples:
        return None
    n = len(samples)
    mean_abs = sum(abs(s) for s in samples) / n / 32768.0
    rms = (sum(s * s for s in samples) / n) ** 0.5 / 32768.0
    zc = sum(
        1 for i in range(1, n) if (samples[i - 1] < 0) != (samples[i] < 0)
    ) / max(n - 1, 1)
    peak = max(abs(s) for s in samples) / 32768.0
    feats = [mean_abs, rms, zc, peak]
    return (feats + [0.0] * dim)[:dim]


def make_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Serialize an uncompressed 24-bit bottom-up BMP (test fixture /
    round-trip check).  ``pixel_fn(x, y) -> (b, g, r)`` with y=0 the
    TOP row."""
    row_stride = (width * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            b, g, r = pixel_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_stride - len(row))
        pixel_bytes += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + dib + bytes(pixel_bytes)


def make_png(width: int, height: int, pixel_fn, filter_type: int = 0) -> bytes:
    """Serialize an 8-bit RGB PNG (test fixture / oracle twin).
    ``pixel_fn(x, y) -> (r, g, b)`` with y=0 the top row.

    ``filter_type`` applies that scanline filter to EVERY row (0=None,
    1=Sub, 2=Up, 3=Average, 4=Paeth) so the decoder's unfilter paths
    are each exercisable.  IDAT uses zlib level 0 (stored blocks):
    compression adds nothing to synthetic fixtures, and stored blocks
    make the byte size CLOSED-FORM — for raw scanline bytes
    ``R = height*(1+3*width) <= 65535`` the file is exactly
    ``68 + R`` bytes (8 sig + 25 IHDR + 12 IEND + IDAT 12+2+5+R+4:
    chunk framing, zlib header, one stored-block header, adler32) —
    which is what lets a SQL oracle recompute n_bytes without zlib.
    """
    stride = width * 3
    data = bytearray()
    prev = bytes(stride)
    for y in range(height):
        rowb = bytes(v for x in range(width) for v in pixel_fn(x, y))
        if filter_type == 0:
            filt = rowb
        elif filter_type == 1:
            filt = bytes(
                (rowb[i] - (rowb[i - 3] if i >= 3 else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:
            filt = bytes((rowb[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:
            filt = bytes(
                (rowb[i] - (((rowb[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:
            filt = bytearray()
            for i in range(stride):
                a = rowb[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt.append((rowb[i] - pred) & 0xFF)
            filt = bytes(filt)
        else:
            raise ValueError(f"unsupported PNG filter {filter_type}")
        data += bytes([filter_type]) + filt
        prev = rowb

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(data), 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def make_wav(samples: list[int], sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Serialize a 16-bit PCM mono/interleaved WAV (test fixture)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * n_channels
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def resize_nearest(decoded: dict, out_w: int, out_h: int) -> dict | None:
    """Nearest-neighbor resize of decoded BMP pixels.

    Source pixel for output (x, y) is (x*w_in // out_w, y*h_in // out_h)
    — pure integer math, so an oracle can recompute the mapping
    closed-form.  Returns a decoded-dict shape {width, height, bpp,
    pixels} over the resized grid.
    """
    pixels = decoded.get("pixels")
    if not pixels or out_w <= 0 or out_h <= 0:
        return None
    w, h = decoded["width"], decoded["height"]
    out = []
    for y in range(out_h):
        sy = y * h // out_h
        base = sy * w
        for x in range(out_w):
            out.append(pixels[base + x * w // out_w])
    return {"width": out_w, "height": out_h, "bpp": decoded.get("bpp"), "pixels": out}


VIDEO_MAGIC = b"VID0"


def make_video(frames: list[bytes]) -> bytes:
    """Serialize a toy video container: magic + frame count + length-
    prefixed frame blobs (each typically a BMP).  Real enough that
    parse must walk variable-length records; simple enough to be
    stdlib-only."""
    out = bytearray(VIDEO_MAGIC)
    out += struct.pack("<I", len(frames))
    for fr in frames:
        out += struct.pack("<I", len(fr))
        out += fr
    return bytes(out)


def parse_video(raw: bytes) -> list[bytes] | None:
    """Walk the length-prefixed container; None if it doesn't validate.
    Truncated trailing frames are dropped, not raised — corrupt blobs
    are data (same posture as parse_bmp/parse_wav)."""
    if len(raw) < 8 or raw[:4] != VIDEO_MAGIC:
        return None
    n = struct.unpack_from("<I", raw, 4)[0]
    frames, pos = [], 8
    for _ in range(n):
        if pos + 4 > len(raw):
            break
        ln = struct.unpack_from("<I", raw, pos)[0]
        pos += 4
        if pos + ln > len(raw):
            break
        frames.append(raw[pos : pos + ln])
        pos += ln
    return frames
