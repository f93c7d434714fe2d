"""Native host runtime (C++ via ctypes).

Builds lazily with g++ on first use; falls back to the pure-Python
implementations in train/dataset.py and selfplay/data.py when a compiler
is unavailable. See codec.cpp for the format contract.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False

NUM_BINARY_PLANES = 37
NUM_SCALARS = 18

SCALAR_FIELDS = [
    "bsize", "komi", "rule", "wave", "to_move", "result",
    "avg_q", "short_q", "mid_q", "long_q", "final_score",
    "avg_s", "short_s", "mid_s", "long_s", "q_stddev", "score_stddev",
    "kld",
]


def _build() -> Path | None:
    src = _HERE / "codec.cpp"
    out = _HERE / "libsayuri_codec.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-o", str(out), str(src),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except (subprocess.SubprocessError, FileNotFoundError):
        return None


def get_lib():
    """The loaded codec library, or None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.sayuri_parse_positions.restype = ctypes.c_int
        lib.sayuri_parse_positions.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.sayuri_serialize_positions.restype = ctypes.c_long
        lib.sayuri_serialize_positions.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p, ctypes.c_long,
        ]
        _LIB = lib
        return _LIB


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_positions(text: str | bytes, bsize: int, cap: int | None = None):
    """Parse a chunk's text into dense arrays.

    Returns dict(planes [N,37,hw], prob [N,hw+1], aux [N,hw+1],
    own [N,hw], scalars [N,18]) or None when the native lib is missing."""
    lib = get_lib()
    if lib is None:
        return None
    if isinstance(text, str):
        text = text.encode()
    hw = bsize * bsize
    if cap is None:
        cap = max(1, text.count(b"\n") // 53 + 1)
    planes = np.zeros((cap, NUM_BINARY_PLANES, hw), np.float32)
    prob = np.zeros((cap, hw + 1), np.float32)
    aux = np.zeros((cap, hw + 1), np.float32)
    own = np.zeros((cap, hw), np.float32)
    scalars = np.zeros((cap, NUM_SCALARS), np.float32)
    n = lib.sayuri_parse_positions(
        text, len(text), bsize,
        _fptr(planes), _fptr(prob), _fptr(aux), _fptr(own), _fptr(scalars),
        cap,
    )
    if n < 0:
        raise ValueError(f"codec parse error {n}")
    return {
        "planes": planes[:n],
        "prob": prob[:n],
        "aux": aux[:n],
        "own": own[:n],
        "scalars": scalars[:n],
    }


def serialize_positions(bsize, planes, prob, aux, own, scalars) -> str | None:
    """Inverse of parse_positions; returns the chunk text, or None when
    the native lib is missing."""
    lib = get_lib()
    if lib is None:
        return None
    n = planes.shape[0]
    hw = bsize * bsize
    planes = np.ascontiguousarray(planes, np.float32)
    prob = np.ascontiguousarray(prob, np.float32)
    aux = np.ascontiguousarray(aux, np.float32)
    own = np.ascontiguousarray(own, np.float32)
    scalars = np.ascontiguousarray(scalars, np.float32)
    cap = n * (200 + NUM_BINARY_PLANES * (hw // 4 + 4) + 2 * (hw + 1) * 14 + hw)
    buf = ctypes.create_string_buffer(cap)
    written = lib.sayuri_serialize_positions(
        n, bsize, _fptr(planes), _fptr(prob), _fptr(aux), _fptr(own),
        _fptr(scalars), buf, cap,
    )
    if written < 0:
        raise ValueError("codec serialize buffer too small")
    return buf.raw[:written].decode()
