"""Pure-stdlib media codecs: PNG (zlib + struct + numpy), BMP (struct),
GIF (hand-rolled LZW), and WAV (wave).

The environment has no PIL/ffmpeg/cv2, but PNG, BMP, GIF and WAV are
simple enough to decode with the standard library alone — PNG is
zlib-compressed scanlines behind a chunked container, BMP is raw padded
BGR scanlines behind two fixed headers, GIF is a palette index stream
under the 12-bit variable-width LZW implemented below, WAV is PCM behind
RIFF — so the multimodal operators (``operators/multimodal.py``) get a
REAL codec for these formats and fall back to the documented
deterministic stub only for payloads that are none of them.

PNG support is deliberately scoped: 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced — the overwhelmingly
common encoder output. Palette/16-bit/interlaced raise with a clear
message rather than decode wrongly. All five scanline filters (None,
Sub, Up, Average, Paeth) are implemented; rows are unfiltered
sequentially (each depends on the prior row) with numpy doing the
per-row arithmetic.

These functions run inside Arrow-batched ``mapInPandas`` loops — one
Python call per payload, vectorized math within — which is the same
boundary PIL would occupy. Nothing else in the distributed plan changes
when a richer codec library is swapped in.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_media(data: bytes) -> str:
    """Cheap container sniff from magic bytes:
    'png' | 'wav' | 'gif' | 'jpeg' | 'bmp' | 'unknown'.

    The BMP magic is only two ASCII bytes ('BM'), so any text payload
    starting "BMW…"/"BMI…" would false-positive on magic alone and crash
    the decoder on garbage header fields. BMP therefore additionally
    requires a plausible 54-byte header: declared file size covering the
    header, both reserved words zero, and a known BITMAPINFOHEADER size —
    the same fields ``bmp_decode`` reads, checked before classifying.
    """
    if data[:8] == PNG_SIGNATURE:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:2] == b"BM" and len(data) >= 54:
        bf_size, reserved, data_offset, bi_size = struct.unpack_from(
            "<IIII", data, 2
        )
        if (
            reserved == 0
            and bi_size in (40, 108, 124)
            and 54 <= data_offset <= len(data)
            and bf_size >= 54
        ):
            return "bmp"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (PNG spec §9.4), vectorized over a scanline."""
    a = a.astype(np.int16)
    b = b.astype(np.int16)
    c = c.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to a (height, width, channels) uint8 array
    (channels axis squeezed away for grayscale)."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type} unsupported")
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG IDAT size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    filters, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f = filters[y]
        cur = rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — recon is a per-channel cumsum of the deltas
            px = cur.reshape(width, bpp).astype(np.int64).cumsum(axis=0) % 256
            out[y] = px.astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            out[y] = cur + prev
        elif f == 3:  # Average
            # sequential left-dependency: plain-int list arithmetic is
            # ~30× faster than per-byte numpy scalar indexing here
            cl, pl = cur.tolist(), prev.tolist()
            for x in range(stride):
                left = cl[x - bpp] if x >= bpp else 0
                cl[x] = (cl[x] + (left + pl[x]) // 2) & 0xFF
            out[y] = cl
        elif f == 4:  # Paeth
            cl, pl = cur.tolist(), prev.tolist()
            for x in range(stride):
                if x >= bpp:
                    a, c = cl[x - bpp], pl[x - bpp]
                else:
                    a = c = 0
                b = pl[x]
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cl[x] = (cl[x] + pred) & 0xFF
            out[y] = cl
        else:
            raise ValueError(f"PNG filter type {f} invalid")
    arr = out.reshape(height, width, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array — (h, w), (h, w, 2|3|4) — as a valid PNG.

    ``filter_type`` applies one filter to every scanline (0/1/2/3/4); the
    non-zero filters exist so tests exercise every decoder unfilter path,
    not for compression ratio.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    bpp = ch
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            pred = _paeth(
                left.astype(np.uint8), prev.astype(np.uint8), upleft.astype(np.uint8)
            )
            filt = cur - pred
        else:
            raise ValueError(f"filter_type {filter_type} invalid")
        lines.append(filter_type)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def png_resize_nearest(data: bytes, target_w: int, target_h: int) -> bytes:
    """Real resize kernel: decode → nearest-neighbor index → re-encode.

    Nearest-neighbor keeps the kernel exact/deterministic (no float
    resampling differences across platforms); a production pipeline would
    swap in PIL's Lanczos here without touching the operator around it.
    """
    arr = png_decode(data)
    h, w = arr.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return png_encode(arr[ys][:, xs])


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------
#
# Windows bitmap, deliberately scoped like the PNG codec: uncompressed
# (BI_RGB) 24-bit BITMAPINFOHEADER files — the overwhelmingly common
# save-as-BMP output. Both row orders are handled (positive biHeight =
# bottom-up, the BMP default; negative = top-down), and 4-byte scanline
# padding is applied/stripped per spec. Anything else (palettized, 16/32
# bpp, RLE, OS/2 core headers) raises NotImplementedError rather than
# decoding wrongly.


def bmp_encode(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, 3) RGB — as a 24-bit
    uncompressed BMP. Grayscale replicates into the three channels.

    ``top_down=True`` writes rows in natural order with negative
    biHeight; the default writes the spec-default bottom-up layout.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("bmp_encode expects (h, w) or (h, w, 3) uint8")
    h, w, _ = arr.shape
    bgr = arr[:, :, ::-1]  # pixel order on disk is BGR
    if not top_down:
        bgr = bgr[::-1]  # bottom row first
    stride = w * 3
    pad = (-stride) % 4
    rows = bytearray()
    for y in range(h):
        rows += bgr[y].tobytes()
        rows += b"\x00" * pad
    pixel_bytes = bytes(rows)
    data_offset = 14 + 40
    file_size = data_offset + len(pixel_bytes)
    file_header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_header = struct.pack(
        "<IiiHHIIiiII",
        40,                       # biSize
        w,
        -h if top_down else h,    # negative = top-down
        1,                        # biPlanes
        24,                       # biBitCount
        0,                        # biCompression = BI_RGB
        len(pixel_bytes),         # biSizeImage
        2835, 2835,               # 72 DPI in px/m — conventional filler
        0, 0,                     # palette entries / important colors
    )
    return file_header + info_header + pixel_bytes


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array,
    normalizing both bottom-up and top-down row orders to natural
    (row 0 = image top) orientation."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_offset,) = struct.unpack_from("<I", data, 10)
    (bi_size,) = struct.unpack_from("<I", data, 14)
    if bi_size < 40:
        raise NotImplementedError(f"BMP header size {bi_size} unsupported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    (bit_count,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bit_count != 24:
        raise NotImplementedError(f"BMP bit count {bit_count} unsupported")
    if compression != 0:
        raise NotImplementedError(f"BMP compression {compression} unsupported")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    stride = w * 3
    padded = stride + ((-stride) % 4)
    pixels = data[data_offset : data_offset + h * padded]
    if len(pixels) != h * padded:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(pixels, dtype=np.uint8).reshape(h, padded)[:, :stride]
    bgr = rows.reshape(h, w, 3)
    if not top_down:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# ---------------------------------------------------------------------------
# GIF (LZW)
# ---------------------------------------------------------------------------
#
# GIF87a/89a: logical screen descriptor + color table(s) + LZW-compressed
# index streams in ≤255-byte sub-blocks. The stdlib has no LZW, but the
# GIF variant (variable code width 3–12 bits LSB-first, CLEAR/END codes,
# dictionary rebuilt on CLEAR) is ~60 lines each way. Scope: single-frame
# (the first image descriptor is decoded; a crawl thumbnail pipeline
# reads exactly that), 2–256-color global or local palette, non-
# interlaced — interlaced files raise rather than decode wrongly.


def _gif_lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-variant LZW: LSB-first bitstream, width grows when the table
    reaches 2^width (cap 12); CLEAR resets; a full table freezes (the
    deferred-clear convention) until the encoder sends CLEAR."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev = None
    acc = nacc = 0
    for byte in data:
        acc |= byte << nacc
        nacc += 8
        while nacc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nacc -= width
            if code == clear:
                table = fresh()
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= clear:
                    raise ValueError("LZW stream starts with non-literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                if len(table) < 4096:
                    table.append(entry)
            else:
                raise ValueError("LZW code beyond table")
            if len(table) == (1 << width) and width < 12:
                width += 1
            out += entry
            if len(out) >= max_out:
                return bytes(out)
            prev = entry
    return bytes(out)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compression (not the uncompressed-GIF trick), mirroring
    the decoder's width-growth rule; emits CLEAR when the table fills."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nacc = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to an (h, w, 3) uint8 RGB
    array via the color table. Interlaced frames raise
    ``NotImplementedError``; malformed/truncated payloads raise
    ``ValueError`` (out-of-range reads in the parser are normalized —
    a crawl payload truncated mid-sub-block must hit the same
    quarantine path as any other corrupt container, not leak an
    IndexError out of an executor task)."""
    try:
        return _gif_decode_inner(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed GIF payload: {exc}") from exc


def _gif_decode_inner(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                sz = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + sz])
                pos += 1 + sz
            idx_bytes = _gif_lzw_decode(
                b"".join(chunks), min_code_size, w * h
            )
            if len(idx_bytes) < w * h:
                raise ValueError("truncated GIF pixel data")
            idx = np.frombuffer(idx_bytes[: w * h], np.uint8).reshape(h, w)
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("palette index beyond color table")
            return ct[idx]
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def gif_encode(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode a 2-D uint8 index array + (n, 3) palette as a single-frame
    GIF89a with a global color table and real LZW compression. The
    palette is padded to the next power of two (min 2, max 256)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("indices must be 2-D, palette (n, 3)")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("index beyond palette")
    size_pow = 1
    while (1 << size_pow) < max(2, pal.shape[0]):
        size_pow += 1
    if size_pow > 8:
        raise ValueError("palette beyond 256 entries")
    n = 1 << size_pow
    full = np.zeros((n, 3), np.uint8)
    full[: pal.shape[0]] = pal
    h, w = idx.shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_pow - 1), 0, 0)
    out += full.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code_size = max(2, size_pow)  # GIF minimum LZW root is 2
    out.append(min_code_size)
    payload = _gif_lzw_encode(idx.tobytes(), min_code_size)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_encode_frames(
    frames: list[np.ndarray], palette: np.ndarray
) -> bytes:
    """Encode a LIST of same-shaped 2-D index arrays as a multi-frame
    (animated) GIF89a: one global color table, one full-canvas image
    descriptor per frame, each with its own LZW stream. No graphic
    control extensions are emitted — the frame-sampling operators read
    frames as independent full images, not a timed animation."""
    if not frames:
        raise ValueError("no frames")
    pal = np.asarray(palette, dtype=np.uint8)
    shapes = {np.asarray(f).shape for f in frames}
    if len(shapes) != 1:
        raise ValueError("frames must share one shape")
    size_pow = 1
    while (1 << size_pow) < max(2, pal.shape[0]):
        size_pow += 1
    if size_pow > 8:
        raise ValueError("palette beyond 256 entries")
    n = 1 << size_pow
    full = np.zeros((n, 3), np.uint8)
    full[: pal.shape[0]] = pal
    h, w = np.asarray(frames[0]).shape
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_pow - 1), 0, 0)
    out += full.tobytes()
    min_code_size = max(2, size_pow)
    for frame in frames:
        idx = np.asarray(frame, dtype=np.uint8)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("index beyond palette")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        payload = _gif_lzw_encode(idx.tobytes(), min_code_size)
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_decode_frames(data: bytes) -> list[np.ndarray]:
    """Decode EVERY frame of a GIF as independent full-canvas RGB
    arrays — the multi-frame surface behind the frame-sampling
    operator. Scope (loud rejection like the single-frame path):
    full-canvas frames only (left = top = 0, frame dims = logical
    screen — no partial-rect composition, no disposal semantics, no
    transparency), global or per-frame color tables, non-interlaced.
    """
    try:
        return _gif_decode_frames_inner(data)
    except (IndexError, struct.error) as e:
        raise ValueError("truncated or corrupt GIF stream") from e


def _gif_decode_frames_inner(data: bytes) -> list[np.ndarray]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    sw, sh = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from(
                "<HHHHB", data, pos + 1
            )
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError("interlaced GIF unsupported")
            if left or top or w != sw or h != sh:
                raise NotImplementedError(
                    "partial-rect GIF frames unsupported (full-canvas "
                    "frames only — no composition/disposal semantics)"
                )
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                sz = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + sz])
                pos += 1 + sz
            pos += 1  # block terminator
            idx_bytes = _gif_lzw_decode(
                b"".join(chunks), min_code_size, w * h
            )
            if len(idx_bytes) < w * h:
                raise ValueError("truncated GIF pixel data")
            idx = np.frombuffer(idx_bytes[: w * h], np.uint8).reshape(h, w)
            if int(idx.max(initial=0)) >= len(ct):
                raise ValueError("palette index beyond color table")
            frames.append(ct[idx])
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> dict:
    """Decode WAV header + PCM frames via the stdlib ``wave`` module.

    Returns sample metadata and the samples as an int numpy array of
    shape (n_frames, n_channels); only 16-bit and 8-bit PCM are mapped
    to arrays (other widths return metadata with ``samples=None``).
    """
    with wave.open(io.BytesIO(data), "rb") as f:
        n_channels = f.getnchannels()
        sample_rate = f.getframerate()
        sample_width = f.getsampwidth()
        n_frames = f.getnframes()
        frames = f.readframes(n_frames)
    samples = None
    if sample_width == 2:
        samples = np.frombuffer(frames, dtype="<i2").reshape(-1, n_channels)
    elif sample_width == 1:
        samples = (
            np.frombuffer(frames, dtype=np.uint8)
            .reshape(-1, n_channels)
            .astype(np.int16)
            - 128
        )
    return {
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "sample_width": sample_width,
        "n_frames": n_frames,
        "samples": samples,
    }


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Encode an int16 (n_frames, n_channels) array as PCM WAV."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# JPEG — baseline sequential (SOF0), hand-rolled Huffman + IDCT.
#
# Scope (the BMP/GIF discipline: decode the overwhelmingly common shape,
# reject everything else loudly): 8-bit baseline sequential JFIF, 1 or 3
# components with NO chroma subsampling (all sampling factors 1, i.e.
# 4:4:4 or grayscale), 8-bit quantization tables, optional restart
# markers. Progressive (SOF2), extended/arithmetic/lossless SOFs,
# subsampled chroma and 16-bit DQTs raise NotImplementedError rather
# than decode wrongly.
#
# Exactness note for the oracle-gated roundtrip (decode_jpeg_dims): a
# DC-only block dequantizes to F00·q00 and inverse-transforms to the
# flat value F00·q00/8 in every pixel (the DC basis is 1/√8 per axis),
# so with q00 = 8 the decoded block is EXACTLY F00 + 128 — integer, no
# rounding ambiguity — which is what lets a lossy format carry a
# closed-form pixel oracle. General AC blocks go through the float
# IDCT like any real decoder.
# --------------------------------------------------------------------------

#: zig-zag scan order: index = zigzag position, value = raster position
JPEG_ZIGZAG = [
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-III basis M (f = Mᵀ·F·M)."""
    u = np.arange(8, dtype=np.float64)[:, None]
    x = np.arange(8, dtype=np.float64)[None, :]
    m = np.sqrt(2.0 / 8.0) * np.cos((2 * x + 1) * u * np.pi / 16.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


_IDCT_M = _jpeg_idct_matrix()


class _BitReader:
    """MSB-first reader over entropy-coded JPEG data with 0xFF00
    unstuffing; restart markers are consumed by ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit()
            else:
                # EOI or another marker mid-read: pad with 1s (spec'd
                # encoder padding) — a well-formed stream never *needs*
                # these bits for real coefficients
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Drop partial-byte state and step over the RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartHit(Exception):
    pass


def _huff_table(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) → value map from the DHT BITS/HUFFVAL arrays
    (canonical JPEG code assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read(1)
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND: map the s raw magnitude bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (scope in the module banner).

    Returns (h, w) uint8 for grayscale, (h, w, 3) uint8 RGB for
    3-component YCbCr (JFIF BT.601 conversion). Truncated or corrupt
    payloads raise ValueError (the loud-rejection discipline — a
    payload can sniff as JPEG on 3 magic bytes alone), never a bare
    IndexError from running off the buffer.
    """
    try:
        return _jpeg_decode_inner(data)
    except (IndexError, KeyError, struct.error) as e:
        # KeyError: a scan referencing an undeclared DQT/DHT table id —
        # corrupt-stream class, same loud contract
        raise ValueError("truncated or corrupt JPEG stream") from e


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit DQT unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                for z in range(64):
                    tbl[JPEG_ZIGZAG[z]] = body[i + 1 + z]
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                huff[(tc, th)] = _huff_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if body[0] != 8:
                raise NotImplementedError("non-8-bit JPEG unsupported")
            h, w = struct.unpack_from(">HH", body, 1)
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                matches = [x for x in comps if x["id"] == cid]
                if not matches:
                    # explicit: a bare next() would raise StopIteration,
                    # which PEP 479 mangles inside generator callers
                    raise ValueError(
                        f"SOS references unknown component id {cid}"
                    )
                comp = matches[0]
                comp["td"], comp["ta"] = tt >> 4, tt & 0x0F
                scan.append(comp)
            break
        # APPn/COM/unknown: skipped via seg_len
    if not comps or h == 0:
        raise ValueError("missing SOF before SOS")
    bw, bh = (w + 7) // 8, (h + 7) // 8
    planes = [
        np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in scan
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(scan)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(scan)
            mcu += 1
            for ci, comp in enumerate(scan):
                try:
                    blk = _decode_block(br, comp, huff, pred, ci)
                except _RestartHit:
                    # encoder emitted RSTn exactly here (defensive: the
                    # interval arithmetic above already handles spec'd
                    # placement)
                    br.sync_restart()
                    pred = [0] * len(scan)
                    blk = _decode_block(br, comp, huff, pred, ci)
                deq = blk * qt[comp["tq"]]
                pix = _IDCT_M.T @ deq @ _IDCT_M
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    out = [
        np.clip(np.round(p[:h, :w]) + 128.0, 0, 255) for p in planes
    ]
    if len(out) == 1:
        return out[0].astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, comp, huff, pred, ci) -> np.ndarray:
    """One 8×8 block: DC (DPCM) + AC run/size loop, dezigzagged."""
    coef = np.zeros(64, dtype=np.int32)
    s = _huff_decode(br, huff[(0, comp["td"])])
    diff = _extend(br.read(s), s) if s else 0
    pred[ci] += diff
    coef[0] = pred[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, huff[(1, comp["ta"])])
        r, size = rs >> 4, rs & 0x0F
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        coef[JPEG_ZIGZAG[k]] = _extend(br.read(size), size)
        k += 1
    blk = np.zeros((8, 8), dtype=np.int32)
    blk.flat = coef
    return blk


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)


def jpeg_encode_gray_ac(coefs: np.ndarray) -> bytes:
    """Encode a grayscale baseline JPEG from RASTER-domain integer
    coefficient blocks ``coefs[by, bx]`` (shape (bh, bw, 8, 8)) with a
    flat all-ones quantization table — the GENERAL-AC entropy path:
    canonical DC + AC Huffman tables, DC DPCM, zig-zag scan with
    run/size coding, ZRL for >15-zero runs, EOB.

    The caller owns coefficient choice. Arbitrary pixel content is NOT
    exactly representable this way — the decoder computes
    ``round(IDCT(C))``, and the image of the integer coefficient
    lattice under the orthonormal IDCT is a rotated lattice whose
    rounding regions miss ~2/3 of integer pixel vectors (measured on
    the dHash fixtures; this is why ``jpeg_encode_gray_dc`` exists).
    Exactness IS available for coefficient patterns whose IDCT is
    integral by construction — e.g. the span of the (0,0), (4,0),
    (0,4), (4,4) basis pairs, where the per-axis irrationals √8 and
    2√2 cancel: ``IDCT(8·c at (4,4)) = c·s(y)·s(x)`` with
    ``s = (+,−,−,+,+,−,−,+)`` — which the dHash JPEG wire
    (``multimodal._jpeg_ac_thumb``) exploits for a closed-form pixel
    oracle over a real lossy-format bitstream.

    Coefficient magnitudes must stay within the 10-bit AC / 11-bit DC
    category range (|AC| ≤ 1023, |DC diff| ≤ 2047) — raises ValueError
    beyond (loud-failure discipline).
    """
    coefs = np.asarray(coefs, dtype=np.int64)
    if coefs.ndim != 4 or coefs.shape[2:] != (8, 8):
        raise ValueError("coefs must be (bh, bw, 8, 8)")
    bh, bw = coefs.shape[:2]
    h, w = bh * 8, bw * 8
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # DQT: all ones (order-invariant under zigzag)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    out += (
        b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + bytes([1, 0x11, 0])
    )
    # DHT DC0: twelve 4-bit codes, canonical ⇒ code == category value
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12)
        + b"\x00" + dc_bits + bytes(range(12))
    )
    # DHT AC0: all 162 baseline AC symbols as 8-bit codes (canonical ⇒
    # code == symbol index; 162 < 255 keeps the all-ones code unused)
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_index = {sym: j for j, sym in enumerate(ac_syms)}
    ac_bits = bytes([0] * 7 + [len(ac_syms)] + [0] * 8)
    out += (
        b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(ac_syms))
        + b"\x10" + ac_bits + bytes(ac_syms)
    )
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    bwtr = _BitWriter()
    prev = 0

    def _mag(v: int, s: int) -> int:
        return v if v >= 0 else v + (1 << s) - 1

    for by in range(bh):
        for bx in range(bw):
            blk = coefs[by, bx]
            zz = [int(blk.flat[JPEG_ZIGZAG[z]]) for z in range(64)]
            diff = zz[0] - prev
            prev = zz[0]
            s = abs(diff).bit_length()
            if s > 11:
                raise ValueError(f"DC diff {diff} exceeds category 11")
            bwtr.write(s, 4)
            if s:
                bwtr.write(_mag(diff, s), s)
            run = 0
            for z in range(1, 64):
                v = zz[z]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bwtr.write(ac_index[0xF0], 8)  # ZRL
                    run -= 16
                s = abs(v).bit_length()
                if s > 10:
                    raise ValueError(f"AC value {v} exceeds size 10")
                bwtr.write(ac_index[(run << 4) | s], 8)
                bwtr.write(_mag(v, s), s)
                run = 0
            if run:
                bwtr.write(ac_index[0x00], 8)  # EOB
    bwtr.flush()
    out += bwtr.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_gray_dc(blocks: np.ndarray, q_dc: int = 8) -> bytes:
    """Encode a grayscale baseline JPEG whose 8×8 blocks are all FLAT:
    ``blocks[by, bx]`` is the DC coefficient of block (bx, by), every AC
    is zero. With ``q_dc = 8`` the decoded pixels are EXACTLY
    ``blocks + 128`` (see the module banner) — the deterministic
    roundtrip witness a lossy container can still carry.

    Emits minimal custom Huffman tables (12 four-bit DC category codes;
    a single 1-bit AC code for EOB) rather than the Annex-K defaults —
    the decoder must honor DHT as parsed, not assume standard tables.
    """
    blocks = np.asarray(blocks, dtype=np.int64)
    bh, bw = blocks.shape
    h, w = bh * 8, bw * 8
    if not (-128 <= blocks.min() and blocks.max() <= 127):
        raise ValueError("DC values must fit int8 range")
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT: q[0] = q_dc in zigzag slot 0, rest 16 (unused — AC all zero)
    qz = bytes([q_dc] + [16] * 63)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qz
    # SOF0: 1 component, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    # DHT DC0: twelve 4-bit codes for categories 0..11
    dc_bits = bytes([0, 0, 0, 12] + [0] * 12)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12) + b"\x00" + dc_bits + bytes(range(12))
    # DHT AC0: one 1-bit code for EOB
    ac_bits = bytes([1] + [0] * 15)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x10" + ac_bits + b"\x00"
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    bwtr = _BitWriter()
    prev = 0
    for by in range(bh):
        for bx in range(bw):
            diff = int(blocks[by, bx]) - prev
            prev = int(blocks[by, bx])
            mag = abs(diff)
            s = mag.bit_length()
            bwtr.write(s, 4)  # DC category code (canonical: code == value)
            if s:
                bwtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            bwtr.write(0, 1)  # EOB (the single AC code '0')
    bwtr.flush()
    out += bwtr.out
    out += b"\xff\xd9"
    return bytes(out)
