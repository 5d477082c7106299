"""ctypes bindings to the native planar decoder (libplanar.so).

Falls back silently to the Python implementation when the library isn't
built; `build()` compiles it with make. The Python planar decoders in
quant/planar.py are the tested oracle; the native ones are bit-identical
(tests/test_native_planar.py).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType, GEOMETRY

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libplanar.so"
_lib = None

# type -> (symbol, group, has_bias)
NATIVE_FNS = {
    GGMLType.Q8_0: ("planar_q8_0", 32, False),
    GGMLType.Q4_0: ("planar_q4_0", 32, False),
    GGMLType.IQ4_NL: ("planar_iq4_nl", 32, False),
    GGMLType.Q4_K: ("planar_q4_K", 32, True),
    GGMLType.Q5_K: ("planar_q5_K", 32, True),
    GGMLType.Q6_K: ("planar_q6_K", 16, False),
    GGMLType.IQ4_XS: ("planar_iq4_xs", 32, False),
    GGMLType.IQ4_K: ("planar_iq4_k", 16, False),
    GGMLType.IQ4_KS: ("planar_iq4_ks", 32, False),
    GGMLType.IQ2_KT: ("planar_iq2_kt", 32, False),
}


def build(verbose: bool = False) -> bool:
    r = subprocess.run(["make", "-C", str(_DIR)], capture_output=not verbose)
    return r.returncode == 0 and _LIB_PATH.exists()


def available() -> bool:
    return _load() is not None


def _load():
    global _lib
    if _lib is None and _LIB_PATH.exists():
        _lib = ctypes.CDLL(str(_LIB_PATH))
        for sym, _, _ in NATIVE_FNS.values():
            fn = getattr(_lib, sym)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    return _lib


def planar_decode_native(data: np.ndarray, ggml_type: GGMLType, n_per_row: int):
    """Returns (codes, scale, bias, group) like quant/planar decoders, or None."""
    lib = _load()
    entry = NATIVE_FNS.get(ggml_type)
    if lib is None or entry is None:
        return None
    sym, group, has_bias = entry
    rb = GEOMETRY[ggml_type].row_bytes(n_per_row)
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    nrows = data.size // rb
    codes = np.empty((nrows, n_per_row), np.int8)
    scale = np.empty((nrows, n_per_row // group), np.float32)
    bias = np.empty((nrows, n_per_row // group), np.float32) if has_bias else None
    rc = getattr(lib, sym)(
        data.ctypes.data, nrows, n_per_row, codes.ctypes.data,
        scale.ctypes.data, bias.ctypes.data if has_bias else None)
    if rc != 0:
        return None
    return codes, scale, bias, group


# -------------------------------------------------- native SPM tokenizer

_SPM_LIB_PATH = _DIR / "libspm.so"
_spm_lib = None


def _load_spm():
    global _spm_lib
    if _spm_lib is None and _SPM_LIB_PATH.exists():
        lib = ctypes.CDLL(str(_SPM_LIB_PATH))
        lib.spm_build.restype = ctypes.c_void_p
        lib.spm_build.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_void_p, ctypes.c_int32]
        lib.spm_free.restype = None
        lib.spm_free.argtypes = [ctypes.c_void_p]
        lib.spm_encode.restype = ctypes.c_int64
        lib.spm_encode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_void_p,
                                   ctypes.c_int64]
        _spm_lib = lib
    return _spm_lib


class NativeSpm:
    """C++ bigram-merge core for the SPM tokenizer (spm.cpp). Built once
    per vocab; encode() returns token ids for a text piece, identical to
    the Python `_spm_encode_piece` oracle."""

    def __init__(self, pieces: list[str], scores, byte_tokens: dict,
                 unk_id: int):
        lib = _load_spm()
        if lib is None:
            raise RuntimeError("libspm.so not built")
        blobs = [p.encode("utf-8") for p in pieces]
        offs = np.zeros(len(blobs) + 1, np.int64)
        for i, b in enumerate(blobs):
            offs[i + 1] = offs[i] + len(b)
        blob = b"".join(blobs)
        sc = np.ascontiguousarray(scores, np.float32)
        bt = np.full(256, -1, np.int32)
        for byte, tid in (byte_tokens or {}).items():
            bt[int(byte)] = tid
        self._lib = lib
        self._handle = lib.spm_build(
            blob, offs.ctypes.data, sc.ctypes.data, len(blobs),
            bt.ctypes.data, int(unk_id if unk_id is not None else -1))

    def encode(self, text: str) -> "list[int] | None":
        data = text.encode("utf-8")
        if not data:
            return []
        out = np.empty(len(data), np.int32)
        n = self._lib.spm_encode(self._handle, data, len(data),
                                 out.ctypes.data, out.size)
        if n < 0:
            return None
        return out[:n].tolist()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.spm_free(self._handle)
        except Exception:
            pass


def spm_available() -> bool:
    return _load_spm() is not None
