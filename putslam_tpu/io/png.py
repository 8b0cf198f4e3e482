"""Minimal dependency-free PNG codec (numpy + zlib).

The sandbox ships no PIL/imageio/cv2, and the reference's datasets are
16-bit-depth + 8-bit-RGB PNG pairs (prepareDatasetFreiburg.py,
convertICLdepthToDepthImage.py). Writing is needed to materialize synthetic
sequences *on disk in TUM format* so the engine's file-player path
(io/tum.py → native/putslam_io.cpp, the FileGrabber equivalent) and the
reference's own evaluation scripts can run end-to-end; reading is the
fallback when the native libpng loader is not built.

Supports grayscale 8/16-bit and RGB 8-bit, no interlace, no palette.
Writer emits filter 0 (None) scanlines; reader handles all five filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def write_png(path: str, arr: np.ndarray) -> None:
    """Write (H,W) uint8 / uint16 grayscale or (H,W,3) uint8 RGB."""
    arr = np.asarray(arr)
    if arr.ndim == 2 and arr.dtype == np.uint8:
        color, depth, payload = 0, 8, arr[:, :, None]
    elif arr.ndim == 2 and arr.dtype == np.uint16:
        color, depth, payload = 0, 16, arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        color, depth, payload = 2, 8, arr
    else:
        raise ValueError(f"unsupported array {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    if depth == 16:
        payload = payload.astype(">u2")
    raw = payload.tobytes()
    stride = w * payload.shape[2] * (depth // 8)
    lines = b"".join(
        b"\x00" + raw[y * stride:(y + 1) * stride] for y in range(h))
    data = zlib.compress(lines, 6)
    with open(path, "wb") as f:
        f.write(_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", data)
                + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def read_png(path: str) -> np.ndarray:
    """Read a PNG → (H,W) uint8/uint16 or (H,W,C) uint8 array."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != _SIG:
        raise ValueError(f"{path}: not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos < len(buf):
        (n,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        payload = buf[pos + 8:pos + 8 + n]
        pos += 12 + n
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    w, h, depth, color, _, _, interlace = ihdr
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    bpp = channels * (depth // 8)          # bytes per pixel
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros((stride,), np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if ft == 0:
            pass
        elif ft == 2:                       # Up
            line += prev
        elif ft in (1, 3, 4):               # Sub / Average / Paeth (serial)
            cur = line.astype(np.int32)
            pr = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ft == 3:
                    cur[i] = (cur[i] + ((a + pr[i]) >> 1)) & 0xFF
                else:
                    c = pr[i - bpp] if i >= bpp else 0
                    cur[i] = (cur[i] + _paeth(a, pr[i], c)) & 0xFF
            line = cur.astype(np.uint8)
        else:
            raise ValueError(f"bad filter {ft}")
        out[y] = line
        prev = out[y]
    if depth == 16:
        img = out.reshape(h, w, channels, 2)
        img = (img[..., 0].astype(np.uint16) << 8) | img[..., 1]
    else:
        img = out.reshape(h, w, channels)
    return img[..., 0] if channels == 1 else img
