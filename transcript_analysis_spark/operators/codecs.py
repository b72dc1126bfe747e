"""Pure-stdlib media codecs: PNG (images) and RIFF/WAV PCM16 (audio).

The container has no PIL/librosa/ffmpeg, but PNG and WAV are fully
decodable with `zlib` + `struct` + numpy — so the engine's multimodal
decode path (`operators/multimodal.py`) can run REAL codecs for those
two kinds instead of the byte-statistics fake. Video container
formats (mp4/mkv) genuinely require ffmpeg and stay stubbed.

Scope (documented, asserted):
- PNG: bit depth 8, color types 0 (gray), 2 (RGB), 6 (RGBA),
  non-interlaced — the dominant real-world shapes. All five scanline
  filters (None/Sub/Up/Average/Paeth) are implemented; the encoder
  cycles filters per row so round-trip tests exercise every path.
- WAV: PCM 16-bit little-endian, any channel count / sample rate.

These run inside `mapInPandas` partitions (decoder cost amortized per
Arrow batch); scanline unfiltering is sequential by spec (each row
depends on the prior), vectorized across the row's bytes with numpy.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (height, width, channels)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if zlib.crc32(ctype + chunk) & 0xFFFFFFFF != \
                struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG shape: depth={depth} color={color} "
            f"interlace={interlace} (supported: 8-bit gray/RGB/RGBA, "
            f"non-interlaced)")
    ch = _CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if ftype == 0:
            recon = line
        elif ftype == 2:  # Up — fully vectorizable
            recon = (line + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            recon = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                up = prior[i]
                ul = prior[i - ch] if i >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                recon[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = recon
        prior = recon.astype(np.int64)
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray, cycle_filters: bool = True) -> bytes:
    """uint8 (H, W) or (H, W, {1,3,4}) -> PNG bytes. With
    `cycle_filters` each row uses filter (row % 5), exercising every
    unfilter path on round-trip; otherwise filter 0 throughout."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    a = arr.astype(np.int64)
    stride = w * ch
    flat = a.reshape(h, stride)
    lines = bytearray()
    for y in range(h):
        ftype = y % 5 if cycle_filters else 0
        line = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        filtered = np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prior[i]
            ul = prior[i - ch] if i >= ch else 0
            pred = (0 if ftype == 0 else
                    left if ftype == 1 else
                    up if ftype == 2 else
                    (left + up) // 2 if ftype == 3 else
                    _paeth(left, up, ul))
            filtered[i] = (line[i] - pred) & 0xFF
        lines.append(ftype)
        lines.extend(filtered.astype(np.uint8).tobytes())

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM16 bytes -> (samples int16 [n, channels], rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _byte_rate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"unsupported WAV: format={audio_fmt} bits={bits} "
            f"(supported: PCM 16-bit)")
    samples = np.frombuffer(pcm, dtype="<i2")
    return samples.reshape(-1, n_ch), rate


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 [n] or [n, channels] -> RIFF/WAV PCM16 bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body
