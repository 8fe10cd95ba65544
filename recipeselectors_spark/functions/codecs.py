"""Pure-numpy media codecs for the multimodal column plumbing.

Uncompressed formats only — zero external dependencies:

* BMP (Windows bitmap, 24-bit ``BI_RGB``): full decode to an (H, W, 3) RGB
  uint8 array, honoring 4-byte row padding, bottom-up vs top-down rows, and
  BGR byte order. Compressed payloads (PNG/JPEG/GIF magic) raise
  ``NotImplementedError`` — a clearly-marked stub, as compression codecs are
  not in this container.
* WAV (RIFF PCM, 8/16-bit): decode to float64 samples in [-1, 1] (channel
  mean for multi-channel) + sample rate, walking the RIFF chunk list.
  Non-PCM formats raise ``NotImplementedError``.

Encoders exist so tests can synthesize REAL payload bytes and assert decoded
feature values, not just plumbing shape.
"""

from __future__ import annotations

import struct

import numpy as np

_COMPRESSED_MAGIC = {
    b"\x89PN": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF": "gif",
}


def _compressed_kind(buf: bytes) -> str | None:
    for magic, name in _COMPRESSED_MAGIC.items():
        if buf[: len(magic)] == magic:
            return name
    return None


# -- BMP ---------------------------------------------------------------------

def encode_bmp(rgb: np.ndarray) -> bytes:
    """24-bit BI_RGB BMP from an (H, W, 3) uint8 RGB array."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        body += arr[r, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    offset = 14 + 40
    size = offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + dib + bytes(body)


def decode_bmp(buf: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) RGB uint8."""
    buf = bytes(buf)
    kind = _compressed_kind(buf)
    if kind is not None:
        raise NotImplementedError(
            f"{kind} decode requires a compression codec (not in this "
            f"container); only uncompressed BMP is supported"
        )
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", buf, 10)[0]
    width = struct.unpack_from("<i", buf, 18)[0]
    height = struct.unpack_from("<i", buf, 22)[0]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP (BI_RLE/BI_BITFIELDS) unsupported")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bit BMP unsupported (24-bit only)")
    top_down = height < 0
    h = abs(height)
    row_bytes = width * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    if len(buf) < offset + stride * h:
        raise ValueError("truncated BMP payload")
    out = np.empty((h, width, 3), dtype=np.uint8)
    for r in range(h):
        src = offset + r * stride
        row = np.frombuffer(buf, dtype=np.uint8, count=row_bytes, offset=src)
        dst = r if top_down else h - 1 - r
        out[dst] = row.reshape(width, 3)[:, ::-1]  # BGR -> RGB
    return out


# -- WAV ---------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit PCM mono WAV from float samples in [-1, 1]."""
    s = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(s * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF PCM WAV -> (float64 samples in [-1,1], sample_rate).
    Multi-channel input is mixed down by channel mean."""
    buf = bytes(buf)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        clen = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"WAV format {audio_format} requires an audio codec "
            f"(not in this container); PCM only"
        )
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported (8/16 only)")
    if channels > 1:
        n = len(s) // channels
        s = s[: n * channels].reshape(n, channels).mean(axis=1)
    return s, int(sample_rate)


# -- feature kernels -----------------------------------------------------------

def image_features(rgb: np.ndarray) -> list[float]:
    """8-dim image features: per-channel means, gray std, width, height,
    aspect ratio, horizontal edge energy."""
    f = rgb.astype(np.float64)
    gray = f.mean(axis=2)
    h, w = gray.shape
    edge = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    return [
        float(f[..., 0].mean()), float(f[..., 1].mean()), float(f[..., 2].mean()),
        float(gray.std()), float(w), float(h), float(w) / float(h), edge,
    ]


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """8-dim audio features: mean, std, min, max, RMS, zero-crossing rate,
    duration (s), sample rate."""
    s = np.asarray(samples, dtype=np.float64)
    if len(s) == 0:
        return [0.0] * 6 + [0.0, float(sample_rate)]
    zcr = float((np.diff(np.signbit(s)) != 0).mean()) if len(s) > 1 else 0.0
    return [
        float(s.mean()), float(s.std()), float(s.min()), float(s.max()),
        float(np.sqrt((s**2).mean())), zcr,
        float(len(s)) / float(sample_rate), float(sample_rate),
    ]
