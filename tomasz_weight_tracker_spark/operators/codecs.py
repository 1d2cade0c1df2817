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


GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> list[int] | None:
    """GIF-variant LZW: LSB-first bitstream, CLEAR/EOI codes, code
    width grows (min+1)..12 as the table fills.  Output is bounded by
    ``max_out`` (the declared raster size), so a crafted stream cannot
    expand past the geometry the header promised."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: dict[int, tuple[int, ...]] = {}
    width = next_code = 0
    prev: tuple[int, ...] | None = None

    def reset() -> None:
        nonlocal table, width, next_code, prev
        table = {i: (i,) for i in range(clear)}
        width = min_code_size + 1
        next_code = eoi + 1
        prev = None

    reset()
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    return None
                out.extend(entry)
            else:
                if code in table:
                    entry = table[code]
                elif code == next_code:  # the KwKwK case
                    entry = prev + (prev[0],)
                else:
                    return None
                out.extend(entry)
                if next_code < 4096:
                    table[next_code] = prev + (entry[0],)
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
            prev = entry
            if len(out) >= max_out:
                return out[:max_out]
    return out


def parse_gif(raw: bytes) -> dict | None:
    """Decode a GIF: logical-screen header always; full pixels (real
    LZW inflate + palette lookup) for a single non-interlaced
    full-screen frame.  Returns the parse_bmp shape — {width, height,
    bpp, pixels} with (b, g, r) row-major tuples — so downstream
    feature extractors stay codec-agnostic.  Interlaced / partial /
    multi-frame-first-partial images decode header-only; malformed
    data returns None (corrupt blobs are data, same posture as the
    other parsers).  The pixel decode is bomb-bounded twice: declared
    geometry capped at _PNG_MAX_PIXELS, and the LZW output capped at
    the declared raster size."""
    if len(raw) < 13 or raw[:6] not in GIF_SIGS:
        return None
    w, h = struct.unpack_from("<HH", raw, 6)
    flags = raw[10]
    if w <= 0 or h <= 0:
        return None
    pos, gct = 13, None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = raw[13 : 13 + 3 * n]
        pos += 3 * n
    out = {"width": w, "height": h, "bpp": 8, "pixels": None}
    while pos < len(raw):
        block = raw[pos]
        if block == 0x3B:  # trailer
            return out
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < len(raw) and raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(raw):
                return out
            ix, iy, iw, ih = struct.unpack_from("<HHHH", raw, pos + 1)
            iflags = raw[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                table = raw[pos : pos + 3 * n]
                pos += 3 * n
            if pos >= len(raw):
                return out
            min_code = raw[pos]
            pos += 1
            data = bytearray()
            while pos < len(raw) and raw[pos] != 0:
                ln = raw[pos]
                data += raw[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            if (
                (iflags & 0x40)  # interlaced: no consumer here
                or (ix, iy, iw, ih) != (0, 0, w, h)  # partial frame
                or table is None
                or not 2 <= min_code <= 11
                or w * h > _PNG_MAX_PIXELS  # untrusted geometry cap
            ):
                return out  # header-only decode
            idxs = _lzw_decode(bytes(data), min_code, w * h)
            if idxs is None or len(idxs) < w * h:
                return out
            ncol = len(table) // 3
            pixels: list[tuple[int, int, int]] = []
            for i in idxs:
                if i >= ncol:
                    return out
                pixels.append((table[3 * i + 2], table[3 * i + 1], table[3 * i]))
            out["pixels"] = pixels
            return out
        else:
            return out  # unknown block: keep the header decode
    return out


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real GIF LZW compression (string table, growing code width,
    table-full reset) — the encoder twin that exercises every decoder
    path including KwKwK and width growth.  Width-bump sync: encoder
    bumps at next_code == (1<<width)+1, decoder at next_code ==
    (1<<width) — the standard one-entry offset (the decoder learns
    each entry one code late)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bits: list[tuple[int, int]] = []  # (code, width)
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    width = min_code_size + 1
    next_code = eoi + 1
    bits.append((clear, width))
    seq: tuple[int, ...] = ()
    for i in indices:
        cand = seq + (i,)
        if cand in table:
            seq = cand
            continue
        bits.append((table[seq], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bits.append((clear, width))
            table = {(j,): j for j in range(clear)}
            width = min_code_size + 1
            next_code = eoi + 1
        seq = (i,)
    if seq:
        bits.append((table[seq], width))
    bits.append((eoi, width))
    # LSB-first bit packing.
    out = bytearray()
    acc = nbits = 0
    for code, cw in bits:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(
    width: int, height: int, index_fn, palette: list[tuple[int, int, int]]
) -> bytes:
    """Serialize a single-frame non-interlaced GIF (test fixture /
    oracle twin).  ``index_fn(x, y) -> palette index`` with y=0 the
    top row; ``palette`` is a list of (r, g, b), padded to the next
    power of two >= 2."""
    ncol = 2
    while ncol < len(palette):
        ncol *= 2
    depth = max(ncol.bit_length() - 1, 1)
    pal = bytearray()
    for j in range(ncol):
        r, g, b = palette[j] if j < len(palette) else (0, 0, 0)
        pal += bytes((r, g, b))
    indices = [index_fn(x, y) for y in range(height) for x in range(width)]
    min_code = max(depth, 2)
    lzw = _lzw_encode(indices, min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += pal
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out += bytes((min_code,))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)


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
