"""Quantization round-trip quality tests.

Mirrors the reference's unit contract (tests/test-quantize-fns.cpp:17-40):
synthetic data 0.1 + 2*cos(i), total RMSE thresholds per bit-width.
"""
import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.quant.quantize import QUANTIZE_FNS, roundtrip

MAX_TOTAL_ERROR = 0.002          # >=3-bit types
MAX_TOTAL_ERROR_TERNARY = 0.0075  # 2-bit types


def synthetic(n: int, offset: float = 0.0) -> np.ndarray:
    i = np.arange(n, dtype=np.float32)
    return 0.1 + 2.0 * np.cos(i + offset)


def total_error(x: np.ndarray, y: np.ndarray) -> float:
    # reference array_rmse (test-quantize-fns.cpp:44): sqrt(sum((a1-a2)^2)) / n
    return float(np.sqrt(np.sum((x - y) ** 2, dtype=np.float64)) / x.size)


THRESHOLDS = {
    GGMLType.Q4_0: MAX_TOTAL_ERROR,
    GGMLType.Q5_0: MAX_TOTAL_ERROR,
    GGMLType.Q6_0: MAX_TOTAL_ERROR,
    GGMLType.Q8_0: MAX_TOTAL_ERROR,
    GGMLType.Q4_K: MAX_TOTAL_ERROR,
    GGMLType.Q5_K: MAX_TOTAL_ERROR,
    GGMLType.Q6_K: MAX_TOTAL_ERROR,
    GGMLType.IQ4_NL: MAX_TOTAL_ERROR,
    GGMLType.IQ4_XS: MAX_TOTAL_ERROR,
    GGMLType.Q8_KV: MAX_TOTAL_ERROR,
    GGMLType.F16: 1e-4,
    GGMLType.BF16: 1e-2,
}


@pytest.mark.parametrize("ttype", sorted(THRESHOLDS, key=int), ids=lambda t: t.name)
def test_roundtrip_error(ttype):
    # reference test size: 32 * 128 (test-quantize-fns.cpp:110)
    x = synthetic(32 * 128).reshape(8, 512)
    y = roundtrip(x, ttype)
    err = total_error(x, y)
    assert err < THRESHOLDS[ttype], f"{ttype.name}: err={err}"


@pytest.mark.parametrize("ttype", sorted(QUANTIZE_FNS, key=int), ids=lambda t: t.name)
def test_roundtrip_shapes(ttype):
    x = synthetic(512).reshape(1, 512)
    y = roundtrip(x, ttype)
    assert y.shape == x.shape
    assert y.dtype == np.float32


def test_q8_0_exact_small_ints():
    """Integers in [-127,127] scaled must round-trip exactly at the block max."""
    x = np.zeros((1, 32), dtype=np.float32)
    x[0, :5] = [127, -127, 64, -1, 1]
    y = roundtrip(x, GGMLType.Q8_0)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_bitnet_iq2_bn_roundtrip():
    import numpy as np
    from ik_llama_cpp_tpu.quant.dequant import dequant_iq2_bn
    from ik_llama_cpp_tpu.quant.quantize import quantize_iq2_bn
    rng = np.random.default_rng(0)
    n = 256
    # ternary source data scaled by a row max
    x = (rng.integers(-1, 2, (3, n)).astype(np.float32)) * 1.7
    x[:, 0] = 1.7       # ensure max is hit
    enc = quantize_iq2_bn(x)
    dec = dequant_iq2_bn(enc.reshape(-1), n).reshape(3, n)
    np.testing.assert_allclose(dec, x, atol=1e-3)


def test_bitnet_iq1_bn_roundtrip():
    import numpy as np
    from ik_llama_cpp_tpu.quant.dequant import dequant_iq1_bn
    from ik_llama_cpp_tpu.quant.quantize import quantize_iq1_bn
    rng = np.random.default_rng(1)
    n = 192
    x = (rng.integers(-1, 2, (4, n)).astype(np.float32)) * 0.9
    x[:, 0] = 0.9
    enc = quantize_iq1_bn(x)
    dec = dequant_iq1_bn(enc.reshape(-1), n).reshape(4, n)
    # iq1_bn decode gives unit trits * f16 row scale
    np.testing.assert_allclose(dec, x, atol=1e-2)
