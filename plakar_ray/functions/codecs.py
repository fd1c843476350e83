"""Pure-numpy codecs for uncompressed media formats.

The sandbox has no PIL/ffmpeg/soundfile, but uncompressed container formats
need no library — their payloads are a header plus a raw sample array, which
numpy decodes directly:

* PPM (P6) / PGM (P5): netpbm binary images, 8-bit, 1 or 3 channels.
* BMP: Windows bitmaps, BI_RGB (uncompressed) 8/24/32-bit, bottom-up or
  top-down rows.
* WAV: RIFF/WAVE with PCM (format 1) 8/16/32-bit or IEEE-float (format 3)
  samples.
* PNG: every legal depth/color combination — gray 1/2/4/8/16, palette
  1/2/4/8, RGB / gray+alpha / RGBA 8/16, non-interlaced or
  Adam7-interlaced. The DEFLATE payload is stdlib zlib and the five
  scanline filters are small byte-wise integer recurrences with a
  bytes-per-pixel left lag (see _png_unfilter), so no imaging library is
  needed; 16-bit samples return exactly as uint16, sub-byte gray by
  exact bit replication.

These make the media stages' strict path REAL for uncompressed inputs and
PNG; JPEG (baseline, extended sequential, progressive) decodes natively
too (sibling module `plakar_ray.functions.jpeg` — tables ride in the file,
the transform is a fixed 8x8 DCT), and MJPEG-in-AVI video frames extract
via the RIFF walker below (each frame is then one JPEG). The remaining
compressed formats (MP3, H.264, ...) stay gated behind optional libraries
(PIL is probed at stage init) because decoding them without one is out of
scope. Encoders exist so tests can round-trip deterministic fixtures
(including 16-bit and interlaced PNGs, JPEGs via jpeg.encode_jpeg /
encode_jpeg_progressive, and MJPEG AVIs via encode_avi_mjpeg).

All decoders take a 1-D uint8 numpy view (zero-copy from an Arrow binary
column) and raise ValueError on malformed input.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- sniffing


def sniff(buf: np.ndarray) -> str:
    """Identify a payload's container format from magic bytes.

    Returns one of 'ppm', 'pgm', 'bmp', 'wav', 'avi', 'jpeg', 'png', or
    'unknown'.
    """
    n = buf.shape[0]
    if n >= 2 and buf[0] == 0x50:  # 'P'
        if buf[1] == 0x36:
            return "ppm"
        if buf[1] == 0x35:
            return "pgm"
    if n >= 2 and buf[0] == 0x42 and buf[1] == 0x4D:  # 'BM'
        return "bmp"
    if (
        n >= 12
        and bytes(buf[:4]) == b"RIFF"
        and bytes(buf[8:12]) == b"WAVE"
    ):
        return "wav"
    if (
        n >= 12
        and bytes(buf[:4]) == b"RIFF"
        and bytes(buf[8:12]) == b"AVI "
    ):
        return "avi"
    if n >= 3 and buf[0] == 0xFF and buf[1] == 0xD8 and buf[2] == 0xFF:
        return "jpeg"
    if n >= 8 and bytes(buf[:8]) == b"\x89PNG\r\n\x1a\n":
        return "png"
    return "unknown"


DECODABLE_IMAGE = frozenset({"ppm", "pgm", "bmp"})
DECODABLE_AUDIO = frozenset({"wav"})

# ----------------------------------------------------------------- netpbm


def _pnm_header(buf: np.ndarray, n_fields: int) -> tuple[list[int], int]:
    """Parse n_fields whitespace-separated ints after the magic, skipping
    '#' comments; returns (fields, offset_of_raster)."""
    fields: list[int] = []
    i = 2  # past magic
    n = buf.shape[0]
    while len(fields) < n_fields:
        while i < n and (buf[i] in (0x20, 0x09, 0x0A, 0x0D) or buf[i] == 0x23):
            if buf[i] == 0x23:  # comment to end of line
                while i < n and buf[i] != 0x0A:
                    i += 1
            i += 1
        j = i
        while j < n and buf[j] not in (0x20, 0x09, 0x0A, 0x0D):
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        fields.append(int(bytes(buf[i:j])))
        i = j
    if i >= n:
        raise ValueError("truncated PNM header")
    return fields, i + 1  # single whitespace byte separates header and raster


def decode_pnm(buf: np.ndarray) -> tuple[int, int, int, np.ndarray]:
    """P6 (RGB) / P5 (gray) binary netpbm -> (width, height, channels,
    pixels[h, w, c] uint8). Only maxval <= 255 (1 byte/sample) supported."""
    kind = sniff(buf)
    if kind not in ("ppm", "pgm"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if kind == "ppm" else 1
    (width, height, maxval), off = _pnm_header(buf, 3)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    need = width * height * channels
    raster = buf[off : off + need]
    if raster.shape[0] < need:
        raise ValueError("truncated PNM raster")
    return width, height, channels, raster.reshape(height, width, channels)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """pixels[h, w, 3] or [h, w] uint8 -> P6/P5 bytes (test fixtures)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        magic, h, w = b"P5", px.shape[0], px.shape[1]
    elif px.ndim == 3 and px.shape[2] == 3:
        magic, h, w = b"P6", px.shape[0], px.shape[1]
    elif px.ndim == 3 and px.shape[2] == 1:
        magic, h, w = b"P5", px.shape[0], px.shape[1]
    else:
        raise ValueError("expected [h,w], [h,w,1] or [h,w,3] uint8")
    return magic + b"\n%d %d\n255\n" % (w, h) + px.tobytes()


# -------------------------------------------------------------------- BMP


def decode_bmp(buf: np.ndarray) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed (BI_RGB) 8/24/32-bit BMP -> (width, height, channels,
    pixels[h, w, c] uint8, rows top-down, BGR->RGB swapped)."""
    if sniff(buf) != "bmp":
        raise ValueError("not a BMP payload")
    if buf.shape[0] < 54:
        raise ValueError("truncated BMP header")
    head = bytes(buf[:54])
    data_off = struct.unpack_from("<I", head, 10)[0]
    hdr_size = struct.unpack_from("<I", head, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP core-header variant not supported")
    width, height_raw = struct.unpack_from("<ii", head, 18)
    bpp = struct.unpack_from("<H", head, 28)[0]
    compression = struct.unpack_from("<I", head, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported")
    top_down = height_raw < 0
    height = abs(height_raw)
    channels = bpp // 8
    stride = (width * channels + 3) & ~3  # rows padded to 4 bytes
    need = data_off + stride * height
    if buf.shape[0] < need:
        raise ValueError("truncated BMP raster")
    rows = buf[data_off : data_off + stride * height].reshape(height, stride)
    px = rows[:, : width * channels].reshape(height, width, channels)
    if not top_down:
        px = px[::-1]
    if channels >= 3:  # BGR(A) -> RGB(A)
        px = px[:, :, [2, 1, 0] + ([3] if channels == 4 else [])]
    return width, height, channels, np.ascontiguousarray(px)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """pixels[h, w, 3] uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected [h,w,3] uint8 RGB")
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = np.zeros((h, stride), dtype=np.uint8)
    raster[:, : w * 3] = px[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    data = raster.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# -------------------------------------------------------------------- WAV


def decode_wav(buf: np.ndarray) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM or IEEE-float -> (sample_rate, channels,
    samples[n, channels] float64 in [-1, 1])."""
    if sniff(buf) != "wav":
        raise ValueError("not a RIFF/WAVE payload")
    n = buf.shape[0]
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = bytes(buf[pos : pos + 4])
        csize = struct.unpack("<I", bytes(buf[pos + 4 : pos + 8]))[0]
        body = buf[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", bytes(body[:16]))
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise ValueError("invalid channel count")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            samples = (data.astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            samples = (
                data[: data.shape[0] & ~1].view(np.int16).astype(np.float64) / 32768.0
            )
        elif bits == 32:
            samples = (
                data[: data.shape[0] & ~3].view(np.int32).astype(np.float64)
                / 2147483648.0
            )
        else:
            raise ValueError(f"{bits}-bit PCM not supported")
    elif audio_fmt == 3 and bits == 32:  # IEEE float
        samples = data[: data.shape[0] & ~3].view(np.float32).astype(np.float64)
    else:
        raise ValueError(f"WAV format {audio_fmt}/{bits}-bit not supported")
    frames = samples.shape[0] // channels
    return rate, channels, samples[: frames * channels].reshape(frames, channels)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """samples[n] or [n, c] float in [-1, 1] -> 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    pcm = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2").tobytes()
    block = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# -------------------------------------------------------------------- PNG
# PNG needs no imaging library either: the container is chunked, the
# payload is stdlib-zlib DEFLATE, and the five scanline filters are small
# integer recurrences — Up and Sub are fully vectorizable (row-wise add,
# per-byte-lane prefix sum mod 256); Average/Paeth fall back to a per-pixel
# loop only on the rows that actually use them.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px
# Adam7 interlace grid: (x0, y0, dx, dy) per pass, spec order.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(dec: np.ndarray, h: int, stride: int, bpp: int, pos: int):
    """Reconstruct `h` scanlines of `stride` bytes from the filtered stream
    `dec` starting at byte `pos` -> (rows[h, stride] uint8, next_pos).

    Filters operate on BYTES with the left-neighbor lag equal to the bytes
    per complete pixel (`bpp` — 2x the channel count at depth 16), per the
    PNG spec. Up and Sub are vectorized (row add / per-byte-lane prefix sum
    mod 256); Average/Paeth fall back to a per-byte loop only on the rows
    that actually use them."""
    out = np.empty((h, stride), np.uint16)  # uint16 scratch, mod-256 at use
    prior = np.zeros(stride, np.uint16)
    for y in range(h):
        f = int(dec[pos])
        rl = dec[pos + 1 : pos + 1 + stride].astype(np.uint16)
        pos += 1 + stride
        if f == 0:  # None
            cur = rl
        elif f == 2:  # Up
            cur = (rl + prior) & 0xFF
        elif f == 1:  # Sub: per-byte-lane prefix sum mod 256
            cur = rl.copy()
            for k in range(bpp):
                lane = cur[k::bpp]
                np.cumsum(lane, out=lane)
                lane &= 0xFF
        else:  # Average (3) / Paeth (4): sequential recurrence
            cur = np.zeros(stride, np.uint16)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                if f == 3:
                    cur[x] = (int(rl[x]) + ((a + b) >> 1)) & 0xFF
                elif f == 4:
                    cc = int(prior[x - bpp]) if x >= bpp else 0
                    p = a + b - cc
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else cc)
                    cur[x] = (int(rl[x]) + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prior = cur
    return out.astype(np.uint8), pos


def decode_png(buf: np.ndarray) -> tuple[int, int, int, np.ndarray]:
    """PNG -> (width, height, channels, pixels[h, w, c]).

    Supports every legal depth/color combination: gray 1/2/4/8/16, palette
    1/2/4/8 (expanded to RGB), RGB / gray+alpha / RGBA 8/16; non-interlaced
    and Adam7-interlaced. 16-bit pixels return as exact uint16; sub-byte
    gray scales to the full 8-bit range by bit replication (17/85/255
    steps, exact integers); palette indices index PLTE unscaled."""
    import zlib

    raw = bytes(buf)
    if raw[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(raw):
        (clen,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if (
        depth not in (1, 2, 4, 8, 16)
        or comp != 0
        or filt != 0
        or interlace not in (0, 1)
    ):
        raise ValueError(
            f"unsupported PNG (depth={depth}, interlace={interlace})"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if depth < 8 and color not in (0, 3):
        raise ValueError(f"sub-byte depth illegal for color type {color}")
    if color == 3 and depth == 16:
        raise ValueError("16-bit palette is not legal PNG")
    ch = _PNG_CHANNELS[color]
    bpp = max(1, ch * depth // 8)  # filter left-lag in bytes (>=1 per spec)
    sdt = np.uint16 if depth == 16 else np.uint8

    def stride_of(wl: int) -> int:  # filtered scanline bytes for wl pixels
        return (wl * ch * depth + 7) // 8

    def to_samples(rows: np.ndarray, wl: int) -> np.ndarray:
        """(n, stride_of(wl)) reconstructed bytes -> (n, wl, ch) samples."""
        if depth == 8:
            return rows.reshape(-1, wl, ch)
        if depth == 16:  # big-endian sample pairs -> exact uint16
            b16 = rows.reshape(-1, wl, ch, 2).astype(np.uint16)
            return (b16[..., 0] << 8) | b16[..., 1]
        # sub-byte: big-endian bit groups within each scanline byte
        bits = np.unpackbits(rows, axis=1)[:, : wl * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        vals = (bits.reshape(-1, wl, depth) * weights).sum(axis=2).astype(np.uint8)
        return vals[:, :, None]

    dec = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace == 0:
        stride = stride_of(w)
        if dec.shape[0] != h * (stride + 1):
            raise ValueError("PNG payload size mismatch")
        rows, _ = _png_unfilter(dec, h, stride, bpp, 0)
        px = to_samples(rows, w)
    else:
        # Adam7: seven independently-filtered sub-images, scattered onto
        # the (y0::dy, x0::dx) sample grid (sub-byte passes re-pack at
        # their own width, so scatter samples, not bytes); empty passes
        # contribute no scanlines.
        passes = []
        expect = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            passes.append((x0, y0, dx, dy, wp, hp))
            if wp > 0 and hp > 0:
                expect += hp * (stride_of(wp) + 1)
        if dec.shape[0] != expect:
            raise ValueError("PNG payload size mismatch")
        px = np.zeros((h, w, ch), sdt)
        p = 0
        for x0, y0, dx, dy, wp, hp in passes:
            if wp <= 0 or hp <= 0:
                continue
            sub, p = _png_unfilter(dec, hp, stride_of(wp), bpp, p)
            px[y0::dy, x0::dx] = to_samples(sub, wp)
    if color == 3:  # palette -> RGB
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
        ch = 3
    elif depth < 8:  # gray bit replication: 0..2^d-1 -> exact 0..255 steps
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return w, h, ch, px


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """pixels[h, w] or [h, w, c] (c in 1/2/3/4) -> PNG bytes (filter 0
    scanlines, one zlib IDAT). uint8 input writes depth 8; uint16 writes
    depth 16 (big-endian samples). interlace=True writes Adam7 passes."""
    import zlib

    px = np.asarray(pixels)
    depth = 16 if px.dtype == np.uint16 else 8
    px = px.astype(np.uint16 if depth == 16 else np.uint8, copy=False)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def rowbytes(sub: np.ndarray) -> bytes:
        hh, ww = sub.shape[:2]
        if depth == 8:
            raw = sub.reshape(hh, ww * ch)
        else:
            be = np.empty((hh, ww, ch, 2), np.uint8)
            be[..., 0] = (sub >> 8).astype(np.uint8)
            be[..., 1] = (sub & 0xFF).astype(np.uint8)
            raw = be.reshape(hh, ww * ch * 2)
        scan = np.zeros((hh, raw.shape[1] + 1), np.uint8)
        scan[:, 1:] = raw
        return scan.tobytes()

    if interlace:
        payload = b"".join(
            rowbytes(px[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if px[y0::dy, x0::dx].size
        )
    else:
        payload = rowbytes(px)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(payload, 6))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------- AVI/MJPEG


def avi_frame_spans(buf: np.ndarray) -> list[tuple[int, int]]:
    """Walk an AVI's RIFF chunk tree and return (offset, size) for every
    video frame payload ('..dc' compressed / '..db' uncompressed chunks,
    usually inside the 'movi' LIST). For an MJPEG AVI each span is one
    complete JPEG, decodable by functions/jpeg.decode_jpeg.

    Zero-copy: spans index into the caller's buffer. Raises ValueError on
    non-AVI or truncated chunk structure.
    """
    n = buf.shape[0]
    if n < 12 or bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"AVI ":
        raise ValueError("not an AVI")
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = bytes(buf[pos:pos + 4])
            size = int.from_bytes(bytes(buf[pos + 4:pos + 8]), "little")
            body = pos + 8
            if body + size > end:
                raise ValueError("truncated AVI chunk")
            if cid in (b"LIST", b"RIFF"):
                walk(body + 4, body + size)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append((body, size))
            pos = body + size + (size & 1)

    walk(12, n)
    return frames


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Pack pre-encoded JPEG frames into a minimal spec-valid MJPEG AVI
    (hdrl with avih/strh/strf, movi with 00dc chunks, idx1), so tests can
    round-trip video fixtures without ffmpeg."""
    if not frames:
        raise ValueError("need at least one frame")
    usec = 1_000_000 // max(fps, 1)
    maxbytes = max(len(f) for f in frames)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", usec, maxbytes * fps, 0, 0x10, len(frames), 0, 1,
        maxbytes, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<10I", 0, 0, 0, 1, fps, 0, len(frames), maxbytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack(
        "<I2i2H", 40, width, height, 1, 24) + b"MJPG" + struct.pack(
        "<i2i2I", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray()
    idx = bytearray()
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<3I", 0x10, 4 + len(movi_body), len(f))
        movi_body += chunk(b"00dc", f)
    movi = lst(b"movi", bytes(movi_body))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
