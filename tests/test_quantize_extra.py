"""Encoder tests for Q4_1 / Q5_1 / MXFP4 / Q2_K / Q3_K / IQ4_KSS
(quant/quantize_extra.py): round-trip through our golden-tested decoders
plus a quality cross-check against the reference encoder (libggml
ggml_quantize_chunk via ctypes) — the same strategy as
tests/test_quantize_iqk.py / test-quantize-fns.cpp."""
import math

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.quant.dequant import dequantize
from ik_llama_cpp_tpu.quant.quantize import quantize, roundtrip

from test_quantize_iqk import _LIB, ref_roundtrip, rmse, synth

EXTRA_TYPES = [GGMLType.Q4_1, GGMLType.Q5_1, GGMLType.MXFP4,
               GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.IQ4_KSS]


@pytest.mark.parametrize("t", EXTRA_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("use_imatrix", [False, True],
                         ids=["plain", "imatrix"])
def test_extra_encoder_quality_vs_reference(t, use_imatrix):
    if _LIB is None:
        pytest.skip("reference libggml missing")
    rng = np.random.default_rng(3)
    x = synth(16, 512) + rng.standard_normal((16, 512)).astype(np.float32)
    im = None
    if use_imatrix:
        im = (1.0 + rng.random(512)).astype(np.float32)
    ours = roundtrip(x, t, imatrix=im)
    ref = ref_roundtrip(x, t, imatrix=im)
    e_ours, e_ref = rmse(ours, x), rmse(ref, x)
    assert e_ours <= e_ref * 1.03, (e_ours, e_ref)


# error bars per test-quantize-fns.cpp:17-23 (sqrt(SSE)/n metric); MXFP4 is
# a pure power-of-two-scale format, reference CI treats it like 4-bit
INVARIANT_BAR = {
    GGMLType.Q4_1: 0.002, GGMLType.Q5_1: 0.002,
    GGMLType.Q2_K: 0.0075, GGMLType.Q3_K: 0.004,
    GGMLType.MXFP4: 0.004, GGMLType.IQ4_KSS: 0.002,
}


@pytest.mark.parametrize("t", EXTRA_TYPES, ids=lambda t: t.name)
def test_extra_encoder_reference_invariants(t):
    x = synth(8, 1024)
    y = roundtrip(x, t)
    err = math.sqrt(float(np.sum((x - y) ** 2))) / x.size
    assert err < INVARIANT_BAR[t], err


def test_mxfp4_bitexact_vs_reference():
    """MXFP4 has no search — our encoder must match the reference encoder
    byte for byte."""
    if _LIB is None:
        pytest.skip("reference libggml missing")
    x = synth(4, 512)
    ours = roundtrip(x, GGMLType.MXFP4)
    ref = ref_roundtrip(x, GGMLType.MXFP4)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("t", EXTRA_TYPES, ids=lambda t: t.name)
def test_extra_bytes_decode_cleanly(t):
    x = synth(4, 512)
    b = quantize(x, t)
    y = dequantize(b, t, 512)
    assert y.size == 4 * 512
    assert np.isfinite(y).all()
