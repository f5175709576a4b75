"""Pure-stdlib media codecs for the multimodal stages.

The container ships no image/audio libraries, but "no PIL" does not have
to mean "stub": PNG is zlib + per-row filters (both stdlib-expressible)
and WAV decodes with the stdlib ``wave`` module. These codecs make the
multimodal stages' ``real`` mode genuinely real — bytes in, pixels /
samples out — while remaining the FALLBACK: when PIL (or another
production decoder) is importable it is preferred (see
``functions/multimodal.py`` mode="auto" resolution).

Scope (documented, asserted): PNG — 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced; WAV — PCM 8/16-bit,
any channel count; RAWV — this engine's trivial raw-video container
(``RAWV`` magic, uint16 w/h/n_frames header, concatenated 8-bit gray
frames) standing in for codec video until ``av``/``cv2`` is installed.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w, channels)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG variant (depth={depth} color={color} interlace={interlace})")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_start + 1).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left-to-right
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                up = int(prev[x])
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - ch]) if x >= ch else 0
                    p = left + up - ul
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, {1,2,3,4}) array -> PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize of (h, w, c) -> (th, tw, c) — one numpy
    fancy-index, no Python pixel loop."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(th) * h) // th, h - 1)
    xs = np.minimum((np.arange(tw) * w) // tw, w - 1)
    return img[ys[:, None], xs[None, :]]


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate). PCM 8/16-bit via the stdlib ``wave`` module."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate, ch, width = f.getframerate(), f.getnchannels(), f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1, 1] shaped (n,) or (n, channels) -> 16-bit PCM WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


_RAWV_MAGIC = b"RAWV"


def decode_rawv(data: bytes) -> np.ndarray:
    """RAWV container -> uint8 frames (n_frames, h, w)."""
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, n = struct.unpack("<HHH", data[4:10])
    need = w * h * n
    body = np.frombuffer(data, dtype=np.uint8, count=need, offset=10)
    return body.reshape(n, h, w)


def encode_rawv(frames: np.ndarray) -> bytes:
    """uint8 (n_frames, h, w) -> RAWV bytes."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    return _RAWV_MAGIC + struct.pack("<HHH", w, h, n) + f.tobytes()
