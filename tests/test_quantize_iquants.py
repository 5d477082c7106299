"""Codebook i-quant encoder tests (IQ2_XXS/XS/S, IQ3_XXS/S, IQ1_S/M):
round-trip through our golden-tested decoders plus a quality cross-check
against the reference encoder (libggml via ctypes) on the same data — the
tests/test_quantize_iqk.py strategy."""
import math

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.quant.dequant import dequantize
from ik_llama_cpp_tpu.quant.quantize import quantize, roundtrip

from test_quantize_iqk import _LIB, ref_roundtrip, rmse, synth

IQUANT_TYPES = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                GGMLType.IQ3_XXS, GGMLType.IQ3_S]
IQ1_TYPES = [GGMLType.IQ1_S, GGMLType.IQ1_M]


@pytest.mark.parametrize("t", IQUANT_TYPES + IQ1_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("use_imatrix", [False, True],
                         ids=["plain", "imatrix"])
def test_iquant_encoder_quality_vs_reference(t, use_imatrix):
    if _LIB is None:
        pytest.skip("reference libggml missing")
    rng = np.random.default_rng(3)
    x = synth(8, 512) + rng.standard_normal((8, 512)).astype(np.float32)
    im = None
    if use_imatrix:
        im = (1.0 + rng.random(512)).astype(np.float32)
    ref_im = im
    needs_im = t in (GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ1_S,
                     GGMLType.IQ1_M)
    if needs_im and ref_im is None:
        # ggml_quantize_requires_imatrix asserts for these types; the
        # reference's own no-imatrix wrappers substitute all-ones
        # (quantize_row_iq1_m_ref)
        ref_im = np.ones(512, np.float32)
    ours = roundtrip(x, t, imatrix=im)
    ref = ref_roundtrip(x, t, imatrix=ref_im)
    e_ours, e_ref = rmse(ours, x), rmse(ref, x)
    assert e_ours <= e_ref * 1.03, (e_ours, e_ref)


# sqrt(SSE)/n bars: 2-bit codebook formats get the reference's low-bit bar
# (test-quantize-fns.cpp MAX_QUANTIZATION_TOTAL_ERROR_2BITS = 0.0075,
# ternary relaxed); 3-bit 0.004; 1.5-2 bpw formats have no reference CI bar
# — these values are the reference encoder's own measured error + margin
INVARIANT_BAR = {
    GGMLType.IQ2_XXS: 0.0095, GGMLType.IQ2_XS: 0.0085,
    GGMLType.IQ2_S: 0.008, GGMLType.IQ3_XXS: 0.0050,
    GGMLType.IQ3_S: 0.0045, GGMLType.IQ1_S: 0.013, GGMLType.IQ1_M: 0.012,
}


@pytest.mark.parametrize("t", IQUANT_TYPES + IQ1_TYPES, ids=lambda t: t.name)
def test_iquant_encoder_reference_invariants(t):
    x = synth(8, 1024)
    y = roundtrip(x, t)
    err = math.sqrt(float(np.sum((x - y) ** 2))) / x.size
    assert err < INVARIANT_BAR[t], err


@pytest.mark.parametrize("t", IQUANT_TYPES + IQ1_TYPES, ids=lambda t: t.name)
def test_iquant_bytes_decode_cleanly(t):
    x = synth(4, 512)
    b = quantize(x, t)
    y = dequantize(b, t, 512)
    assert y.size == 4 * 512
    assert np.isfinite(y).all()
