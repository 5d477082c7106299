"""IQK quantizer encoder tests: round-trip through our golden-tested decoder
plus a quality cross-check against the REFERENCE encoder (libggml's
ggml_quantize_chunk via ctypes) on the same data — the test-quantize-fns
strategy (tests/test-quantize-fns.cpp:17-23) with the reference itself as
the quality bar."""
import ctypes
import math
from pathlib import Path

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType, GEOMETRY
from ik_llama_cpp_tpu.quant.quantize import quantize, roundtrip
from ik_llama_cpp_tpu.quant.dequant import dequantize

LIBGGML = Path("/tmp/refbuild/ggml/src/libggml.so")


def _ref_lib():
    if not LIBGGML.exists():
        return None
    lib = ctypes.CDLL(str(LIBGGML))
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    # the ik fork adds a trailing `const quantize_user_data *` (ggml.h:3124)
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p]
    return lib


_LIB = _ref_lib()


def ref_roundtrip(x: np.ndarray, t: GGMLType, imatrix=None) -> np.ndarray:
    """Quantize with the reference encoder, decode with OUR decoder (which
    is golden-tested bit-exact against the reference decoder)."""
    nrows, n = x.shape
    row_bytes = GEOMETRY[t].row_bytes(n)
    buf = np.zeros(nrows * row_bytes, np.uint8)
    xf = np.ascontiguousarray(x, np.float32)
    im = None
    if imatrix is not None:
        im = np.ascontiguousarray(imatrix, np.float32)
    written = _LIB.ggml_quantize_chunk(
        int(t), xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.ctypes.data_as(ctypes.c_void_p), 0, nrows, n,
        None if im is None else im.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        None)
    assert written == buf.size, (written, buf.size)
    return dequantize(buf, t, n).reshape(nrows, n)


def synth(nrows, n, seed=0):
    """The reference test's synthetic data: 0.1 + 2*cos(i + offset)."""
    i = np.arange(nrows * n, dtype=np.float32).reshape(nrows, n)
    return 0.1 + 2.0 * np.cos(i + 0.1 * seed)


def rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


IQK_TYPES = [GGMLType.IQ4_KS, GGMLType.IQ4_K, GGMLType.IQ5_KS,
             GGMLType.IQ5_K, GGMLType.IQ6_K, GGMLType.IQ3_K,
             GGMLType.IQ3_KS, GGMLType.IQ2_K, GGMLType.IQ2_KS,
             GGMLType.IQ2_KL]
# trellis types: exact whole-codebook search (ours) vs the reference's
# k-means-pruned search — ours matches or beats it
KT_TYPES = [GGMLType.IQ1_KT, GGMLType.IQ2_KT, GGMLType.IQ3_KT,
            GGMLType.IQ4_KT]


@pytest.mark.parametrize("t", IQK_TYPES + KT_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("use_imatrix", [False, True], ids=["plain", "imatrix"])
def test_iqk_encoder_quality_vs_reference(t, use_imatrix):
    if _LIB is None:
        pytest.skip("reference libggml missing")
    rng = np.random.default_rng(3)
    nrows = 4 if t in KT_TYPES else 16   # exact trellis search is O(V) slow
    x = synth(nrows, 512) + rng.standard_normal((nrows, 512)).astype(np.float32)
    im = None
    if use_imatrix:
        im = (1.0 + rng.random(512)).astype(np.float32)
    ours = roundtrip(x, t, imatrix=im)
    ref = ref_roundtrip(x, t, imatrix=im)
    e_ours, e_ref = rmse(ours, x), rmse(ref, x)
    # within 3% of the reference encoder's error (not bit-identical: numpy
    # f32/f64 accumulation differs from the scalar C loops)
    assert e_ours <= e_ref * 1.03, (e_ours, e_ref)


# per-type bars from tests/test-quantize-fns.cpp:17-23 (error metric is
# sqrt(SSE)/n, NOT plain RMSE)
INVARIANT_BAR = {
    GGMLType.IQ4_KS: 0.002, GGMLType.IQ4_K: 0.002,
    GGMLType.IQ5_KS: 0.002, GGMLType.IQ5_K: 0.002, GGMLType.IQ6_K: 0.002,
    GGMLType.IQ3_K: 0.004, GGMLType.IQ3_KS: 0.004,
    GGMLType.IQ2_K: 0.0075, GGMLType.IQ2_KS: 0.0085, GGMLType.IQ2_KL: 0.0075,
}


@pytest.mark.parametrize("t", IQK_TYPES, ids=lambda t: t.name)
def test_iqk_encoder_reference_invariants(t):
    """test-quantize-fns.cpp invariants on its synthetic data."""
    x = synth(8, 1024)
    y = roundtrip(x, t)
    err = math.sqrt(float(np.sum((x - y) ** 2))) / x.size
    assert err < INVARIANT_BAR[t], err


def test_iq4_ks_bytes_decode_cleanly():
    x = synth(4, 512)
    b = quantize(x, GGMLType.IQ4_KS)
    y = dequantize(b, GGMLType.IQ4_KS, 512)
    assert y.size == 4 * 512
    assert np.isfinite(y).all()
