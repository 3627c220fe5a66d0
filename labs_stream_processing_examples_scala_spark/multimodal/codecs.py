"""Stdlib-only binary codecs for the multimodal columns.

Real decoders for three self-describing container formats — 24-bit
uncompressed BMP, binary PPM (P6), and PCM WAV — implemented with
``struct``/``wave``/numpy only, since this container has no image or
audio libraries. These are not toy stand-ins: the bytes are real BMP/
PPM/WAV files that any external tool can open, so the decode step in
:mod:`columns` operates on decoded pixel/sample content, and PIL/
soundfile (when present on a cluster) become an optimization, not a
prerequisite.

Encoders exist so fixtures and the mixed-modality synthesis step can
produce deterministic, genuinely-decodable payloads.

All functions are row-local pure functions of the payload bytes —
they run inside Arrow-batched ``mapInPandas`` workers and never touch
the driver.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --- BMP (Windows BITMAPINFOHEADER, 24-bit, BI_RGB) ---


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP bytes
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    h, w, _ = pixels.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * pad
    size_image = len(body)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + size_image, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, size_image, 2835, 2835, 0, 0
    )
    return bytes(header) + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → RGB uint8 array (h, w, 3).
    Handles bottom-up (positive height) and top-down (negative) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    row_raw = w * 3
    stride = row_raw + (4 - row_raw % 4) % 4
    data = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, :row_raw].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # stored bottom-up → return top-down
    return rows[:, :, ::-1].copy()  # BGR → RGB


# --- PPM (P6 binary, maxval 255) ---


def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → binary PPM (P6) bytes."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → RGB uint8 array (h, w, 3). Returns the
    array and is tolerant of comments/extra whitespace in the header."""
    arr, _ = _decode_ppm_at(payload, 0)
    return arr


def _decode_ppm_at(payload: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Decode one P6 image starting at ``pos``; return (pixels,
    next_pos). P6 headers declare their pixel size, so concatenated
    frames are self-delimiting — the basis of the toy video container."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 payload")
    pos += 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    n = w * h * 3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(h, w, 3)
    return pixels.copy(), pos + n


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated P6 images → list of RGB arrays (the toy video
    container: frames are just back-to-back PPMs)."""
    frames, pos = [], 0
    while pos < len(payload) and payload[pos : pos + 2] == b"P6":
        arr, pos = _decode_ppm_at(payload, pos)
        frames.append(arr)
    return frames


# --- WAV (PCM via the stdlib wave module) ---


def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """int16 sample array (mono) → PCM WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """PCM WAV bytes → (n_channels, framerate, int16 samples
    interleaved). 16-bit PCM only (what the fixtures emit)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"unsupported WAV sample width {wf.getsampwidth()}")
        frames = wf.readframes(wf.getnframes())
        return wf.getnchannels(), wf.getframerate(), np.frombuffer(frames, dtype="<i2")


# --- sniffing ---


def sniff_modality(payload: bytes) -> str:
    """Classify a payload by magic bytes: 'image' (BMP or P6 PPM),
    'video' (concatenated P6s — distinguished at decode time), 'audio'
    (RIFF/WAVE), else 'text'."""
    if payload[:2] == b"BM":
        return "image"
    if payload[:2] == b"P6":
        return "image"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "audio"
    return "text"
