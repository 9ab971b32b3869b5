"""Pure-python media codecs: PNG (gray/RGB 8-bit), WAV PCM, Y4M video.

Real, dependency-free implementations of three public formats (PNG per the
W3C spec, WAV per the RIFF/PCM layout, Y4M per the YUV4MPEG2 header
convention) using only stdlib ``zlib``/``struct`` and numpy — no PIL or
ffmpeg, which this container does not have. They back the multimodal decode
stage (:mod:`webgraph_spark.functions.multimodal`) with genuine byte-level
decoding: zlib inflate, scanline filter reconstruction (all five PNG filter
types: None/Sub/Up/Average/Paeth), chunk CRC validation, and container
header parsing.

Scale note: these codecs run *inside* Arrow-batched ``mapInPandas`` kernels
— one Python call per batch, one decode per payload. For production imagery
you would swap the per-payload function for libpng/ffmpeg bindings; the
Spark-side shape (binary in → typed struct out, partition-parallel) is
identical and is what the engine tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(tag + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + tag + data + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode a ``(h, w)`` gray or ``(h, w, 3)`` RGB uint8 array as PNG.

    ``filter_mode='cycle'`` applies filter type ``row % 5`` per scanline so
    a round-trip exercises every reconstruction path in
    :func:`decode_png`; ``'none'`` writes unfiltered scanlines.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        color_type, bpp = 0, 1
        flat = px
    elif px.ndim == 3 and px.shape[2] == 3:
        h, w = px.shape[:2]
        color_type, bpp = 2, 3
        flat = px.reshape(h, w * 3)
    else:
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8")

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        row = flat[y].astype(np.int32)
        ft = (y % 5) if filter_mode == "cycle" else 0
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), row[:-bpp]])
            filt = (row - (left + prev) // 2) % 256
        else:  # Paeth
            filt = np.empty_like(row)
            for x in range(len(row)):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                filt[x] = (int(row[x]) - _paeth(a, b, c)) % 256
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    ihdr = struct.pack(">II", w, h) + bytes([8, color_type, 0, 0, 0])
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit gray or RGB PNG to a ``(h, w)`` / ``(h, w, 3)``
    uint8 array. Validates the signature and chunk CRCs, inflates the IDAT
    stream, and reconstructs every scanline filter type (spec §9:
    None/Sub/Up/Average/Paeth). Interlacing and palettes unsupported."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = bpp = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNGs supported")
            if color_type == 0:
                bpp = 1
            elif color_type == 2:
                bpp = 3
            else:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or bpp is None:
        raise ValueError("missing IHDR")

    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    off = 0
    for y in range(h):
        ft = raw[off]
        row = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        off += stride + 1
        if ft == 0:
            recon = row
        elif ft == 1:  # Sub: recon[x] = row[x] + recon[x-bpp]
            recon = row.copy()
            for x in range(bpp, stride):
                recon[x] = (recon[x] + recon[x - bpp]) % 256
        elif ft == 2:  # Up
            recon = (row + prev) % 256
        elif ft == 3:  # Average
            recon = row.copy()
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                recon[x] = (recon[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth
            recon = row.copy()
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                recon[x] = (recon[x] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    return out if bpp == 1 else out.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono 8-bit unsigned PCM samples as a RIFF/WAVE file."""
    pcm = np.asarray(samples, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 8-bit PCM WAV; returns ``(samples, sample_rate)``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or channels != 1 or bits != 8:
                raise ValueError("only mono 8-bit PCM supported")
        elif tag == b"data":
            samples = np.frombuffer(body, dtype=np.uint8)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode ``(n_frames, h, w)`` uint8 gray frames as YUV4MPEG2 (Cmono)."""
    fr = np.asarray(frames, dtype=np.uint8)
    if fr.ndim != 3:
        raise ValueError("expected (n_frames, h, w)")
    n, h, w = fr.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
    out = bytearray(head)
    for i in range(n):
        out.extend(b"FRAME\n")
        out.extend(fr[i].tobytes())
    return bytes(out)


def decode_y4m(data: bytes) -> np.ndarray:
    """Decode a Cmono YUV4MPEG2 stream to ``(n_frames, h, w)`` uint8."""
    nl = data.index(b"\n")
    head = data[:nl].decode()
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    params = dict(
        (tok[0], tok[1:]) for tok in head.split()[1:] if tok
    )
    if params.get("C", "420") != "mono":
        raise ValueError("only Cmono supported")
    w, h = int(params["W"]), int(params["H"])
    frames = []
    pos = nl + 1
    fsz = w * h
    while pos < len(data):
        fl = data.index(b"\n", pos)
        if data[pos:fl].split(b" ")[0] != b"FRAME":
            raise ValueError("bad frame marker")
        frames.append(
            np.frombuffer(data, np.uint8, fsz, fl + 1).reshape(h, w)
        )
        pos = fl + 1 + fsz
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)
