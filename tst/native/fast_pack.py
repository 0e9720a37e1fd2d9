"""ctypes binding + on-demand build of the native packing kernel.

Build model: compile ``csrc/fast_pack.cpp`` with the system g++ into a
cached ``.so`` next to this module on first use (no pybind11 in this image;
the C ABI + ctypes keeps the binding dependency-free). Falls back cleanly:
``native_available()`` is False when no compiler exists and callers keep the
pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "csrc", "fast_pack.cpp")
_SO = os.path.join(_DIR, "_fast_pack.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load_so() -> ctypes.CDLL:
    lib = ctypes.CDLL(_SO)
    lib.pack_byte_batch.restype = ctypes.c_int
    lib.pack_byte_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    stale = not (os.path.exists(_SO)
                 and os.path.getmtime(_SO) >= os.path.getmtime(_SRC))
    if stale and not _compile():
        _build_failed = True
        return None
    try:
        return _load_so()
    except (OSError, AttributeError):
        # partially-written or incompatible .so (e.g. a killed build):
        # rebuild once, then give up cleanly — callers keep the Python path
        try:
            os.remove(_SO)
        except OSError:
            pass
        if _compile():
            try:
                return _load_so()
            except (OSError, AttributeError):
                pass
        _build_failed = True
        return None


def native_available() -> bool:
    global _lib
    if _lib is not None:
        return True
    if _build_failed:
        return False
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
    return _lib is not None


def pack_byte_batch(
    prompts: bytes,
    p_off: np.ndarray,  # int64 [n+1]
    targets: bytes,
    t_off: np.ndarray,  # int64 [n+1]
    L: int,
    pad_id: int,
    bos_id: int,
    eos_id: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """→ (tokens int32 [n,L], loss_mask f32 [n,L], answer_pos [n], lengths [n]).

    Exact semantics of the Python ByteTokenizer packing path (tested)."""
    if not native_available():
        raise RuntimeError("native fast_pack unavailable (no g++?)")
    n = len(p_off) - 1
    tokens = np.empty((n, L), np.int32)
    loss_mask = np.empty((n, L), np.float32)
    answer_pos = np.empty(n, np.int32)
    lengths = np.empty(n, np.int32)
    p_off = np.ascontiguousarray(p_off, np.int64)
    t_off = np.ascontiguousarray(t_off, np.int64)
    rc = _lib.pack_byte_batch(
        prompts, p_off.ctypes.data, targets, t_off.ctypes.data,
        ctypes.c_int64(n), ctypes.c_int64(L),
        ctypes.c_int32(pad_id), ctypes.c_int32(bos_id), ctypes.c_int32(eos_id),
        tokens.ctypes.data, loss_mask.ctypes.data,
        answer_pos.ctypes.data, lengths.ctypes.data,
    )
    if rc != 0:
        i = -rc - 1
        raise ValueError(f"sample {i}: target alone nearly fills bucket {L}")
    return tokens, loss_mask, answer_pos, lengths
