"""Pure-stdlib YUV4MPEG2 (.y4m) decoder + frame-sampled video features.

Makes the video channel of the multimodal pipeline REAL without adding any
dependency (NOTES round-5 backlog #4, same move as the PNG/WAV decoders):
no ffmpeg in the container, but Y4M is the standard uncompressed
interchange format (mjpegtools; used by ffmpeg/x264 test suites) and is a
plain-text header plus raw YUV planes -- exact to parse with numpy.
Supports the common chroma layouts C420 (all three pixel-siting aliases:
420, 420jpeg, 420mpeg2, 420paldv share one plane layout), C422, C444 and
Cmono. Compressed containers (MP4/WebM/MKV) need a real codec library and
raise NotImplementedError -- callers fall back to the deterministic digest
feature.
"""

from __future__ import annotations

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2"

#: chroma tag -> (u/v width divisor, u/v height divisor); None = no chroma
_CHROMA = {
    "420": (2, 2),
    "420jpeg": (2, 2),
    "420mpeg2": (2, 2),
    "420paldv": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


def is_y4m(data: bytes) -> bool:
    return data.startswith(Y4M_MAGIC)


def decode_y4m(data: bytes, max_frames: int | None = None) -> np.ndarray:
    """bytes -> (n_frames, height, width) uint8 LUMA planes.

    Chroma planes are parsed (they set the per-frame stride) but only luma
    is returned -- the feature below is luminance-based, matching the PNG
    channel. Raises ValueError for non-Y4M/corrupt input and
    NotImplementedError for unsupported chroma layouts."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream (bad signature)")
    eol = data.find(b"\n")
    if eol < 0:
        raise ValueError("missing Y4M header terminator")
    width = height = None
    chroma = "420jpeg"  # spec default when no C tag is present
    for tok in data[len(Y4M_MAGIC) : eol].split(b" "):
        if not tok:
            continue
        tag, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "C":
            chroma = val
        # F (framerate), I (interlace), A (aspect), X (comment) do not
        # affect the plane layout
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if chroma not in _CHROMA:
        raise NotImplementedError(f"Y4M chroma layout C{chroma} not supported")
    div = _CHROMA[chroma]
    luma_size = width * height
    chroma_size = 0 if div is None else 2 * ((width // div[0]) * (height // div[1]))
    frame_bytes = luma_size + chroma_size

    frames = []
    pos = eol + 1
    n = len(data)
    while pos < n:
        feol = data.find(b"\n", pos)
        if feol < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M FRAME header")
        pos = feol + 1  # frame-level params (rare) are layout-irrelevant
        plane = data[pos : pos + frame_bytes]
        if len(plane) != frame_bytes:
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(plane[:luma_size], dtype=np.uint8).reshape(height, width)
        )
        pos += frame_bytes
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("Y4M stream with zero frames")
    return np.stack(frames)


def video_feature(luma: np.ndarray, k: int = 4, grid: int = 2) -> np.ndarray:
    """(n_frames, H, W) luma -> k*grid*grid float32 feature: k evenly-spaced
    sampled frames (first and last always included), each reduced to a
    grid x grid block-mean luminance cell (the PNG channel's pixel_feature
    shape). Deterministic and frame-rate-metadata-invariant."""
    nf, h, w = luma.shape
    idx = np.unique(np.linspace(0, nf - 1, k).round().astype(int))
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    out = np.zeros(k * grid * grid, dtype=np.float32)
    for fi, f in enumerate(idx):
        frame = luma[f].astype(np.float32)
        for i in range(grid):
            for j in range(grid):
                cell = frame[
                    ys[i] : max(ys[i + 1], ys[i] + 1),
                    xs[j] : max(xs[j + 1], xs[j] + 1),
                ]
                out[fi * grid * grid + i * grid + j] = float(cell.mean()) / 255.0
    return out
