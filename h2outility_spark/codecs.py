"""Pure-Python (stdlib-only) media codecs for the multimodal operators.

This container has no PIL/ffmpeg, so the heavy formats (JPEG/WebP/MP4) stay
behind injectable ``decode_fn``/``resize_fn`` hooks — but four formats are
simple enough for stdlib ``struct``/``zlib``, which un-stubs the default
codec path end-to-end (sniffed by magic bytes):

  * **Uncompressed 24-bit BMP** (BITMAPINFOHEADER, BI_RGB): decode to
    (width, height, mean_luma), and nearest-neighbor resize with re-encode.
  * **Non-interlaced 8-bit PNG** (gray, gray+alpha, RGB, RGBA): full
    scanline unfiltering (all five filter types) over zlib-inflated IDAT;
    encode as filter-0 RGB for the resize round-trip.
  * **GIF87a/89a first frame**: variable-width LSB-first LZW decode with
    clear/end codes and the KwKwK case; resize re-encodes as PNG.
  * **PCM WAV**: RIFF header parse to (channels, sample_rate, bits,
    n_frames, duration_ms), mean absolute amplitude, windowed RMS /
    zero-crossing features, and ``dhash64`` perceptual image hashing.

These run inside Arrow-batched ``mapInPandas`` workers (operators/
multimodal.py); per-pixel Python costs what it costs, but the *plumbing* is
identical to a PIL-backed deployment — swapping in a fast codec changes one
callable, not the plan.
"""

from __future__ import annotations

import struct

_BMP_HEADER_FMT = "<2sIHHI"  # magic, file size, reserved, reserved, pixel offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER


def _bmp_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # 24 bpp rows pad to 4-byte boundaries


def decode_bmp(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an uncompressed 24-bit BMP to (width, height, rows of (r,g,b)),
    rows in top-to-bottom order regardless of the file's scanline direction."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    _, _, _, _, pixel_off = struct.unpack_from(_BMP_HEADER_FMT, data, 0)
    info_size, width, height, _planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if info_size < 40:
        raise ValueError(f"unsupported BMP header size {info_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    stride = _bmp_row_stride(width)
    rows = []
    for r in range(height):
        src_row = r if top_down else height - 1 - r
        base = pixel_off + src_row * stride
        row = []
        for c in range(width):
            b, g, red = data[base + c * 3 : base + c * 3 + 3]
            row.append((red, g, b))
        rows.append(row)
    return width, height, rows


def encode_bmp(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode rows of (r, g, b) (top-to-bottom) as an uncompressed 24-bit
    BMP (bottom-up scanlines, the common convention)."""
    height = len(rows)
    width = len(rows[0]) if rows else 0
    stride = _bmp_row_stride(width)
    pixel_bytes = bytearray()
    for row in reversed(rows):  # bottom-up
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += b"\x00" * (stride - len(line))
        pixel_bytes += line
    pixel_off = 14 + 40
    header = struct.pack(_BMP_HEADER_FMT, b"BM", pixel_off + len(pixel_bytes), 0, 0, pixel_off)
    info = struct.pack(_BMP_INFO_FMT, 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + bytes(pixel_bytes)


def _luma(r: int, g: int, b: int) -> float:
    return (0.299 * r + 0.587 * g + 0.114 * b) / 255.0


def _mean_luma_of(width: int, height: int, rows) -> float:
    """Shared mean-luma reduction for every image decoder."""
    n = width * height
    total = sum(_luma(r, g, b) for row in rows for (r, g, b) in row)
    return round(total / n, 6) if n else 0.0


def _resize_rows(rows, width: int, height: int, max_side: int):
    """Shared nearest-neighbor bounding-box downscale (never upscales,
    like PIL's thumbnail). Integer source-index arithmetic so every
    format resizes identically."""
    scale = min(1.0, max_side / max(width, height, 1))
    out_w, out_h = max(1, int(width * scale)), max(1, int(height * scale))
    out = [
        [
            rows[min(height - 1, r * height // out_h)][min(width - 1, c * width // out_w)]
            for c in range(out_w)
        ]
        for r in range(out_h)
    ]
    return out, out_w, out_h


def _codec_guard(fn):
    """Normalize parser slips on corrupt payloads (KeyError / IndexError /
    struct.error) to the codec contract: corrupt bytes raise ValueError —
    a bad asset fails its row with a structured error, never escapes with
    an implementation-detail exception."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except (KeyError, IndexError, struct.error) as e:
            raise ValueError(f"corrupt payload in {fn.__name__}: {type(e).__name__}: {e}") from e

    return wrapped


def bmp_image_decoder(data: bytes) -> tuple[int, int, float]:
    """Default ``decode_fn`` for extract_image_features: (width, height,
    mean luma in [0, 1], 6 dp) of an uncompressed 24-bit BMP."""
    width, height, rows = decode_bmp(data)
    return width, height, _mean_luma_of(width, height, rows)


def bmp_resizer(data: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Default ``resize_fn`` for resize_images: nearest-neighbor bounding-box
    downscale of an uncompressed 24-bit BMP, re-encoded as BMP."""
    width, height, rows = decode_bmp(data)
    out_rows, out_w, out_h = _resize_rows(rows, width, height, max_side)
    return encode_bmp(out_rows), out_w, out_h


# -- WAV ---------------------------------------------------------------------


def parse_wav_header(data: bytes) -> dict:
    """Parse a RIFF/WAVE header: channels, sample rate, bits per sample,
    frame count, duration_ms, and the (offset, size) of the PCM data chunk.
    Walks the chunk list, so extra chunks (LIST, fact) are tolerated."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data_span = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, n_ch, rate, _byte_rate, _align, bits = struct.unpack_from("<HHIIHH", data, body)
            fmt = {"audio_format": audio_fmt, "n_channels": n_ch, "sample_rate": rate, "bits_per_sample": bits}
        elif cid == b"data":
            data_span = (body, size)
        pos = body + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_span is None:
        raise ValueError("WAV missing fmt or data chunk")
    frame_size = fmt["n_channels"] * fmt["bits_per_sample"] // 8
    n_frames = data_span[1] // frame_size if frame_size else 0
    duration_ms = int(n_frames * 1000 / fmt["sample_rate"]) if fmt["sample_rate"] else 0
    return fmt | {"n_frames": n_frames, "duration_ms": duration_ms, "data_span": data_span}


def wav_audio_decoder(data: bytes) -> tuple[int, int, int, float]:
    """Default ``decode_fn`` for extract_audio_features: (sample_rate,
    n_channels, duration_ms, mean absolute amplitude in [0, 1]) of a 16-bit
    PCM WAV."""
    h = parse_wav_header(data)
    if h["audio_format"] != 1 or h["bits_per_sample"] != 16:
        raise ValueError(
            f"only 16-bit PCM WAV supported (format={h['audio_format']}, bits={h['bits_per_sample']})"
        )
    off, size = h["data_span"]
    samples = struct.unpack_from(f"<{size // 2}h", data, off)
    mean_abs = round(sum(abs(s) for s in samples) / (len(samples) * 32768.0), 6) if samples else 0.0
    return h["sample_rate"], h["n_channels"], h["duration_ms"], mean_abs


# -- PNG ---------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a non-interlaced 8-bit PNG (gray, gray+alpha, RGB, RGBA) to
    (width, height, rows of (r, g, b)) with stdlib zlib + struct: chunk
    walk, IDAT inflate, and the five scanline filters inverted per the
    spec. Alpha is dropped; grayscale replicates to RGB. Palette, 16-bit,
    and interlaced variants raise (inject a real codec for those)."""
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (missing signature)")
    pos, idat, hdr = 8, b"", None
    while pos + 8 <= len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        cid = data[pos + 4 : pos + 8]
        body = pos + 8
        if cid == b"IHDR":
            w, h, bitd, color, _comp, _filt, interlace = struct.unpack_from(
                ">IIBBBBB", data, body
            )
            if bitd != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(
                    f"unsupported PNG variant (bit depth {bitd}, color {color}, "
                    f"interlace {interlace}); inject a full decoder"
                )
            if w == 0 or h == 0:
                raise ValueError("empty PNG (zero width or height)")
            hdr = (w, h, color)
        elif cid == b"IDAT":
            idat += data[body : body + size]
        elif cid == b"IEND":
            break
        pos = body + size + 4  # skip CRC
    if hdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, color = hdr
    nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    stride = w * nch
    expected = h * (stride + 1)
    try:
        # Bounded inflate: a hostile IDAT can expand to gigabytes from a
        # few kilobytes (decompression bomb); never inflate past the
        # pixel-buffer size the declared dimensions call for.
        d = zlib.decompressobj()
        raw = d.decompress(idat, expected)
    except zlib.error as e:
        # normalize to the codec contract: corrupt payloads raise ValueError
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if len(raw) < expected:
        raise ValueError("PNG pixel data truncated")
    rows: list[list[tuple[int, int, int]]] = []
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        ftype = raw[p]
        line = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 255
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 255
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                c = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 255
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = line
        if nch == 1:
            row = [(g, g, g) for g in line]
        elif nch == 2:
            row = [(line[i], line[i], line[i]) for i in range(0, stride, 2)]
        elif nch == 3:
            row = [tuple(line[i : i + 3]) for i in range(0, stride, 3)]
        else:
            row = [tuple(line[i : i + 3]) for i in range(0, stride, 4)]
        rows.append(row)
    return w, h, rows


def encode_png(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode (r, g, b) rows as an 8-bit RGB PNG (filter 0, one IDAT)."""
    import zlib

    h = len(rows)
    w = len(rows[0]) if h else 0

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + cid
            + body
            + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + bytes(v for px in row for v in px) for row in rows)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_image_decoder(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean luma) of a supported PNG — PNG twin of
    bmp_image_decoder."""
    width, height, rows = decode_png(data)
    return width, height, _mean_luma_of(width, height, rows)


def png_resizer(data: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Nearest-neighbor bounding-box downscale of a PNG, re-encoded as
    8-bit RGB PNG (alpha dropped)."""
    width, height, rows = decode_png(data)
    out_rows, out_w, out_h = _resize_rows(rows, width, height, max_side)
    return encode_png(out_rows), out_w, out_h


def sniff_image_decoder(data: bytes) -> tuple[int, int, float]:
    """Format-sniffing default ``decode_fn``: BMP, PNG, or GIF by magic."""
    if data[:2] == b"BM":
        return bmp_image_decoder(data)
    if data[:8] == _PNG_MAGIC:
        return png_image_decoder(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return gif_image_decoder(data)
    raise ValueError("unsupported image format (built-ins: BMP, PNG, GIF) — inject decode_fn")


def sniff_image_resizer(data: bytes, max_side: int) -> tuple[bytes, int, int]:
    """Format-sniffing default ``resize_fn``. BMP/PNG stay in their input
    format; GIF re-encodes as PNG (writing LZW is not worth a stdlib
    encoder when PNG is the archival target anyway)."""
    if data[:2] == b"BM":
        return bmp_resizer(data, max_side)
    if data[:8] == _PNG_MAGIC:
        return png_resizer(data, max_side)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        width, height, rows = decode_gif(data)
        out_rows, out_w, out_h = _resize_rows(rows, width, height, max_side)
        return encode_png(out_rows), out_w, out_h
    raise ValueError("unsupported image format (built-ins: BMP, PNG, GIF) — inject resize_fn")


def wav_window_features(data: bytes, window_ms: int = 100) -> list[tuple[int, int, float, float]]:
    """Windowed features of a 16-bit PCM WAV: per non-overlapping window of
    ``window_ms``, (window_idx, start_ms, rms, zero_crossing_rate), both in
    [0, 1], 6 dp. Multi-channel audio is mixed to mono by sample averaging
    first — the standard front-end before VAD / silence trimming / speech
    quality gates in audio-corpus pipelines."""
    import math

    h = parse_wav_header(data)
    if h["audio_format"] != 1 or h["bits_per_sample"] != 16:
        raise ValueError("only 16-bit PCM WAV supported for window features")
    off, size = h["data_span"]
    flat = struct.unpack_from(f"<{size // 2}h", data, off)
    nch = h["n_channels"]
    mono = (
        list(flat)
        if nch == 1
        else [sum(flat[i : i + nch]) // nch for i in range(0, len(flat) - nch + 1, nch)]
    )
    spw = max(1, h["sample_rate"] * window_ms // 1000)
    out = []
    for w_idx in range(0, (len(mono) + spw - 1) // spw):
        chunk = mono[w_idx * spw : (w_idx + 1) * spw]
        rms = math.sqrt(sum((s / 32768.0) ** 2 for s in chunk) / len(chunk))
        crossings = sum(
            1 for a, b in zip(chunk, chunk[1:]) if (a < 0 <= b) or (b < 0 <= a)
        )
        zcr = crossings / (len(chunk) - 1) if len(chunk) > 1 else 0.0
        out.append((w_idx, w_idx * spw * 1000 // h["sample_rate"], round(rms, 6), round(zcr, 6)))
    return out


def dhash64(data: bytes) -> int:
    """64-bit difference hash (dHash) of a BMP/PNG payload: decode, mix to
    luma, nearest-neighbor resample to a 9x8 grid, emit one bit per
    horizontal neighbor pair (left < right). Near-identical images land
    within a few Hamming bits — the standard perceptual fingerprint for
    image dedup, here format-independent (same pixels => same hash
    whether the container was BMP or PNG)."""
    if data[:2] == b"BM":
        w, h, rows = decode_bmp(data)
    elif data[:8] == _PNG_MAGIC:
        w, h, rows = decode_png(data)
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        w, h, rows = decode_gif(data)
    else:
        raise ValueError("unsupported image format for dhash (built-ins: BMP, PNG, GIF)")
    gw, gh = 9, 8
    grid = []
    for gy in range(gh):
        sy = min(h - 1, gy * h // gh)
        grid.append(
            [_luma(*rows[sy][min(w - 1, gx * w // gw)]) for gx in range(gw)]
        )
    bits = 0
    for gy in range(gh):
        for gx in range(gw - 1):
            bits = (bits << 1) | (1 if grid[gy][gx] < grid[gy][gx + 1] else 0)
    return bits


# -- GIF ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: LSB-first variable-width codes, clear/end specials,
    dictionary resets, width bumps at 2^width (cap 12 bits)."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return {i: [i] for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = end + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table, width, next_code, prev = fresh(), min_code_size + 1, end + 1, None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + [prev[0]]  # the KwKwK case
            else:
                raise ValueError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None:
                table[next_code] = prev + [entry[0]]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out


def decode_gif(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode the first frame of a non-interlaced GIF87a/89a to (width,
    height, rows of (r, g, b)) — stdlib-only LZW. Extension blocks are
    skipped; interlaced frames raise (inject a full decoder)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            palette = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = [tuple(data[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
                pos += 3 * n
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported (inject a full decoder)")
            if palette is None:
                raise ValueError("GIF frame without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                size = data[pos]
                lzw += data[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), w * h)
            if len(idx) < w * h:
                raise ValueError("GIF pixel data truncated")
            rows = [
                [palette[idx[y * w + x]] for x in range(w)] for y in range(h)
            ]
            return w, h, rows
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF contained no image frame")


def gif_image_decoder(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean luma) of a GIF first frame."""
    width, height, rows = decode_gif(data)
    return width, height, _mean_luma_of(width, height, rows)


# Apply the corrupt-payload contract to every public parser entry point:
# any KeyError/IndexError/struct.error a malformed payload provokes
# surfaces as ValueError (see _codec_guard).
decode_bmp = _codec_guard(decode_bmp)
decode_png = _codec_guard(decode_png)
decode_gif = _codec_guard(decode_gif)
parse_wav_header = _codec_guard(parse_wav_header)
wav_audio_decoder = _codec_guard(wav_audio_decoder)
wav_window_features = _codec_guard(wav_window_features)
bmp_image_decoder = _codec_guard(bmp_image_decoder)
png_image_decoder = _codec_guard(png_image_decoder)
gif_image_decoder = _codec_guard(gif_image_decoder)
bmp_resizer = _codec_guard(bmp_resizer)
png_resizer = _codec_guard(png_resizer)
sniff_image_decoder = _codec_guard(sniff_image_decoder)
sniff_image_resizer = _codec_guard(sniff_image_resizer)
dhash64 = _codec_guard(dhash64)
