"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is pure JAX/XLA; the pieces that live on the *host*
and are combinatorial rather than numeric — currently the FourierTree leaf
enumerator — have optional C++ implementations compiled on first use with
the system ``g++`` and cached next to the source.  Every native entry point
has a pure-Python fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_leaf_enum.so")
_SRC_PATH = os.path.join(_HERE, "leaf_enum.cpp")

_lock = threading.Lock()
_lib = None
_load_failed = False


class _LeafResult(ctypes.Structure):
    _fields_ = [
        ("S", ctypes.POINTER(ctypes.c_uint8)),
        ("C", ctypes.POINTER(ctypes.c_uint8)),
        ("term_re", ctypes.POINTER(ctypes.c_double)),
        ("term_im", ctypes.POINTER(ctypes.c_double)),
        ("n_leaves", ctypes.c_int64),
    ]


def _compile() -> bool:
    """Compile the shared library (idempotent); returns success."""
    if os.path.isfile(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC_PATH
    ):
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC_PATH,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        log.info(f"native build unavailable ({exc}); using Python fallback")
        return False


def _load():
    """Load (compiling if needed) the native library, or None."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _compile():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.qml_enumerate_leaves.argtypes = [
                np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int32,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_int32,
                ctypes.POINTER(_LeafResult),
            ]
            lib.qml_enumerate_leaves.restype = ctypes.c_int
            lib.qml_free_leaves.argtypes = [ctypes.POINTER(_LeafResult)]
            lib.qml_free_leaves.restype = None
            _lib = lib
        except Exception as exc:  # pragma: no cover
            log.info(f"native load failed ({exc}); using Python fallback")
            _load_failed = True
    return _lib


def native_available() -> bool:
    """Whether the C++ leaf enumerator can be used on this host."""
    return _load() is not None


def enumerate_leaves(
    pauli_words,
    observable_word,
    n_qubits: int,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Run the native leaf enumeration for one observable root.

    Args:
        pauli_words: list of PauliWord rotation generators (tape order).
        observable_word: PauliWord of the root observable.
        n_qubits: register width (must be <= 64 for the packed encoding).

    Returns:
        ``(S, C, terms)`` with shapes ``(n_leaves, n_params)`` (int64) and
        ``(n_leaves,)`` complex128 — or ``None`` if the native path is
        unavailable/ineligible and the Python fallback should run.
    """
    if n_qubits > 64:
        return None
    lib = _load()
    if lib is None:
        return None

    n_params = len(pauli_words)

    def pack(word) -> Tuple[int, int, int]:
        # PauliWord stores packed bitmasks natively.
        return word.xm, word.zm, int(word.phase)

    px = np.zeros(max(n_params, 1), dtype=np.uint64)
    pz = np.zeros(max(n_params, 1), dtype=np.uint64)
    pp = np.zeros(max(n_params, 1), dtype=np.int32)
    for i, w in enumerate(pauli_words):
        px[i], pz[i], pp[i] = pack(w)
    ox, oz, op_ = pack(observable_word)

    res = _LeafResult()
    rc = lib.qml_enumerate_leaves(
        px, pz, pp, np.int32(n_params),
        ctypes.c_uint64(ox), ctypes.c_uint64(oz), np.int32(op_),
        ctypes.byref(res),
    )
    if rc != 0:  # pragma: no cover - allocation failure
        lib.qml_free_leaves(ctypes.byref(res))
        return None

    try:
        n_leaves = int(res.n_leaves)
        if n_leaves == 0:
            S = np.zeros((0, n_params), dtype=np.int64)
            C = np.zeros((0, n_params), dtype=np.int64)
            terms = np.zeros(0, dtype=np.complex128)
        else:
            shape = (n_leaves, n_params)
            S = np.ctypeslib.as_array(res.S, shape=shape).astype(np.int64)
            C = np.ctypeslib.as_array(res.C, shape=shape).astype(np.int64)
            re = np.ctypeslib.as_array(res.term_re, shape=(n_leaves,)).copy()
            im = np.ctypeslib.as_array(res.term_im, shape=(n_leaves,)).copy()
            terms = re + 1j * im
        return S, C, terms
    finally:
        lib.qml_free_leaves(ctypes.byref(res))
