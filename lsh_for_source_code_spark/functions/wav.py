"""Pure-stdlib WAV (RIFF/WAVE) decoder + frame-level audio features.

Makes the audio channel of the multimodal pipeline REAL without adding any
dependency (NOTES round-5 backlog #4, same move as the r4 PNG decoder):
no ffmpeg/soundfile in the container, but WAV's format is public
(RIFF-1991 / RFC 2361 format registry) and PCM/IEEE-float payloads decode
exactly with numpy. Supports the encodings that cover the overwhelming
majority of training-corpus WAVs: integer PCM at 8 (unsigned) / 16 / 24 /
32 bit and IEEE float32/float64, any channel count (mixed to mono),
including WAVE_FORMAT_EXTENSIBLE wrappers around either. Compressed codecs
(ADPCM, mu-law, MP3-in-WAV) raise NotImplementedError -- callers fall back
to the deterministic digest feature.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

_FMT_PCM = 0x0001
_FMT_IEEE_FLOAT = 0x0003
_FMT_EXTENSIBLE = 0xFFFE


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == WAV_MAGIC and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Yield (chunk_id, body) for every RIFF subchunk. Chunk bodies are
    word-aligned: a chunk with odd size carries one pad byte not counted in
    its size field."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        yield cid, body
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """bytes -> (mono float32 samples in [-1, 1], sample_rate).

    Raises ValueError for non-WAV/corrupt input and NotImplementedError for
    valid-but-unsupported variants (compressed codecs)."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    fmt = None
    pcm = None
    for cid, body in _chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            code, n_ch, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if code == _FMT_EXTENSIBLE:
                # true format code = first 2 bytes of the SubFormat GUID
                if len(body) < 26:
                    raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
                (cb,) = struct.unpack("<H", body[16:18])
                if cb < 22:
                    raise ValueError("extensible fmt chunk missing SubFormat")
                (code,) = struct.unpack("<H", body[24:26])
            fmt = (code, n_ch, rate, bits)
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("missing fmt /data chunk")
    code, n_ch, rate, bits = fmt
    if n_ch == 0 or rate == 0:
        raise ValueError("zero channels/sample-rate")
    if code == _FMT_PCM:
        if bits == 8:
            x = np.frombuffer(pcm, dtype=np.uint8).astype(np.float32)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(pcm, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v -= (v & 0x800000) << 1  # sign-extend 24 -> 32 bit
            x = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            x = np.frombuffer(pcm, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits} not supported")
    elif code == _FMT_IEEE_FLOAT:
        if bits == 32:
            x = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(pcm, dtype="<f8").astype(np.float32)
        else:
            raise NotImplementedError(f"float bit depth {bits} not supported")
    else:
        raise NotImplementedError(f"WAV format code 0x{code:04x} not supported")
    if n_ch > 1:
        x = x[: (len(x) // n_ch) * n_ch].reshape(-1, n_ch).mean(axis=1)
    return x.astype(np.float32), rate


def audio_feature(samples: np.ndarray, n_frames: int = 8) -> np.ndarray:
    """Mono samples -> 2*n_frames float32 feature: per-frame RMS energy and
    zero-crossing rate over n_frames equal windows. Deterministic,
    duration-invariant, and cheap -- the decoded-sample stand-in for a real
    audio embedding (the Spark plumbing is identical either way)."""
    out = np.zeros(2 * n_frames, dtype=np.float32)
    n = len(samples)
    if n == 0:
        return out
    edges = np.linspace(0, n, n_frames + 1).astype(int)
    signs = samples >= 0.0
    for i in range(n_frames):
        lo, hi = edges[i], max(edges[i + 1], edges[i] + 1)
        w = samples[lo:hi]
        if w.size == 0:  # n < n_frames: trailing empty windows stay zero
            continue
        out[i] = float(np.sqrt(np.mean(w * w)))
        if hi - lo > 1:
            s = signs[lo:hi]
            out[n_frames + i] = float(np.mean(s[1:] != s[:-1]))
    return out
