"""Differential tests: Pallas fused dequant-matmul vs jnp oracle vs f32 numpy.

The TPU analogue of the reference's test-backend-ops.cpp cross-backend harness:
random planar weights, kernel output compared to the reference computation
with NMSE thresholds, plus exact comparison against the same-precision oracle.
Runs in Pallas interpret mode on CPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ik_llama_cpp_tpu.ops.qmatmul import qmatmul, qmatmul_ref


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = (a * a).mean() or 1.0
    return float(((a - b) ** 2).mean() / denom)


def make_case(m, k, n, group, bias, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    codes = rng.integers(-127, 128, size=(k, n), dtype=np.int8)
    scale = (rng.standard_normal((k // group, n)) * 0.01).astype(np.float32)
    b = (rng.standard_normal((k // group, n)) * 0.02).astype(np.float32) if bias else None
    return x, codes, scale, b


@pytest.mark.parametrize("m,k,n", [(16, 256, 128), (8, 512, 256), (1, 256, 384), (33, 768, 128)])
@pytest.mark.parametrize("group", [16, 32])
@pytest.mark.parametrize("bias", [False, True])
def test_qmatmul_matches_oracle(m, k, n, group, bias):
    x, codes, scale, b = make_case(m, k, n, group, bias)
    got = qmatmul(x, codes, scale, b, group=group, interpret=True,
                  block_m=32, block_n=128, block_k=256)
    ref = qmatmul_ref(jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scale),
                      None if b is None else jnp.asarray(b), group=group)
    assert got.shape == (m, n)
    assert nmse(ref, got) < 1e-8, f"kernel vs oracle NMSE too high"


def test_qmatmul_vs_f32_reference():
    """End to end: planar-decoded weight matmul error vs full f32 math."""
    m, k, n, g = 16, 512, 256, 32
    x, codes, scale, b = make_case(m, k, n, g, True, seed=3)
    w = codes.astype(np.float32) * np.repeat(scale, g, axis=0) + np.repeat(b, g, axis=0)
    ref = x @ w
    got = qmatmul(x, codes, scale, b, group=g, interpret=True,
                  block_m=32, block_n=128, block_k=256)
    # bf16 mantissa: expect ~1e-5 NMSE
    assert nmse(ref, got) < 1e-4


def test_qmatmul_unaligned_shapes():
    x, codes, scale, b = make_case(5, 256, 96 + 32, 32, False, seed=7)
    got = qmatmul(x, codes, scale, group=32, interpret=True,
                  block_m=16, block_n=128, block_k=256)
    ref = qmatmul_ref(jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scale), group=32)
    assert got.shape == (5, 128)
    assert nmse(ref, got) < 1e-8


def test_qmatmul4_matches_oracle_and_int8():
    """4-bit packed kernel vs its oracle and vs the int8 planar path."""
    import numpy as np
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.ops.qmatmul import (pack_int4, qmatmul4,
                                              qmatmul4_ref, qmatmul_ref)
    rng = np.random.default_rng(7)
    k, n, g = 256, 384, 32
    # q4_0-class codes in [-8, 7]
    codes = rng.integers(-8, 8, (k, n)).astype(np.int8)
    scale = (rng.standard_normal((k // g, n)) * 0.05).astype(np.float32)
    packed, lut = pack_int4(codes)
    assert lut is None
    x = rng.standard_normal((24, k)).astype(np.float32)
    ref8 = qmatmul_ref(jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scale),
                       group=g)
    ref4 = qmatmul4_ref(jnp.asarray(x), jnp.asarray(packed),
                        jnp.asarray(scale), group=g)
    np.testing.assert_allclose(np.asarray(ref4), np.asarray(ref8),
                               rtol=1e-6, atol=1e-6)
    out = qmatmul4(jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
                   group=g, block_m=16, block_n=128, block_k=128,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref4),
                               rtol=1e-5, atol=1e-5)
    # LUT path (iq4_nl-style non-linear values)
    from ik_llama_cpp_tpu.quant import luts
    vals = luts.KVALUES_IQ4NL.astype(np.int8)
    codes_l = vals[rng.integers(0, 16, (k, n))]
    packed_l, lut_l = pack_int4(codes_l)
    assert lut_l is not None and len(lut_l) == 16
    ref8 = qmatmul_ref(jnp.asarray(x), jnp.asarray(codes_l),
                       jnp.asarray(scale), group=g)
    out = qmatmul4(jnp.asarray(x), jnp.asarray(packed_l), jnp.asarray(scale),
                   group=g, lut16=lut_l, block_m=16, block_n=128, block_k=128,
                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref8),
                               rtol=1e-5, atol=1e-5)


class TestI8MXU:
    """int8 x int8 supergroup MXU path (QLinearI8 / qmatmul_i8)."""

    def test_kernel_matches_oracle(self):
        from ik_llama_cpp_tpu.ops.qmatmul import (
            qmatmul_i8, qmatmul_i8_ref, quantize_activations,
            requant_supergroup)
        rng = np.random.default_rng(0)
        m, k, n = 24, 512, 384
        codes = rng.integers(-127, 128, (k, n), dtype=np.int8)
        scale = (rng.random((k // 32, n), dtype=np.float32) * 0.1).astype(np.float32)
        q8, sw = requant_supergroup(codes, scale)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        xq, xs = quantize_activations(x)
        ref = qmatmul_i8_ref(xq, xs, jnp.asarray(q8), jnp.asarray(sw))
        got = qmatmul_i8(xq, xs, jnp.asarray(q8), jnp.asarray(sw))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("m,k,n", [(256, 512, 384), (300, 2048, 640),
                                       (512, 4096, 256)])
    def test_mxu_kernel_matches_oracle(self, m, k, n):
        """Pallas prefill kernel (qmatmul_i8_mxu) == the einsum/oracle
        numerics, including M/K/N padding paths."""
        from ik_llama_cpp_tpu.ops.qmatmul import (
            qmatmul_i8_mxu, qmatmul_i8_ref, quantize_activations,
            requant_supergroup)
        rng = np.random.default_rng(7)
        codes = rng.integers(-127, 128, (k, n), dtype=np.int8)
        scale = (rng.random((k // 32, n), dtype=np.float32) * 0.1)
        q8, sw = requant_supergroup(codes, scale)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        xq, xs = quantize_activations(x)
        ref = qmatmul_i8_ref(xq, xs, jnp.asarray(q8), jnp.asarray(sw))
        got = qmatmul_i8_mxu(xq, xs.T, jnp.asarray(q8), jnp.asarray(sw),
                             interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_requant_close_to_exact(self):
        """Supergroup recode error stays far below 4-bit quantization step."""
        from ik_llama_cpp_tpu.ops.qmatmul import requant_supergroup
        rng = np.random.default_rng(1)
        k, n = 512, 256
        codes = rng.integers(-8, 8, (k, n), dtype=np.int8)   # 4-bit-class
        scale = (0.02 + rng.random((k // 32, n), dtype=np.float32) * 0.05)
        w_exact = codes.astype(np.float32) * np.repeat(scale, 32, axis=0)
        q8, sw = requant_supergroup(codes, scale)
        w_re = q8.astype(np.float32) * np.repeat(sw, 256, axis=0)
        err = np.abs(w_re - w_exact).max()
        step = scale.min()                   # one 4-bit quantum
        assert err < step / 2, (err, step)

    def test_qlinear_i8_close_to_planar(self):
        """QLinearI8 forward tracks QLinear within requant tolerance, incl.
        the bias (Q4_1-class) formats handled via groupsum(x) @ bias."""
        from ik_llama_cpp_tpu.models.weights import QLinear, QLinearI8
        from ik_llama_cpp_tpu.ops.qmatmul import requant_supergroup
        rng = np.random.default_rng(2)
        k, n, m = 512, 256, 8
        codes = rng.integers(0, 16, (k, n), dtype=np.int8)
        scale = (0.02 + rng.random((k // 32, n)) * 0.05).astype(np.float32)
        bias = (rng.standard_normal((k // 32, n)) * 0.01).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        lin = QLinear(jnp.asarray(codes), jnp.asarray(scale, jnp.bfloat16),
                      jnp.asarray(bias, jnp.bfloat16))
        q8, sw = requant_supergroup(codes, scale)
        lin8 = QLinearI8(jnp.asarray(q8), jnp.asarray(sw),
                         jnp.asarray(bias, jnp.bfloat16))
        y_ref = np.asarray(lin(x))
        y_i8 = np.asarray(lin8(x))
        denom = np.abs(y_ref).mean() + 1e-6
        rel = np.abs(y_i8 - y_ref).mean() / denom
        assert rel < 0.02, rel

    def test_load_linear_i8_toggle(self, tmp_path):
        """set_i8_mxu(True) loads planar GGUF tensors as QLinearI8 and the
        model still generates."""
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from fixtures import make_tiny_llama_gguf
        from ik_llama_cpp_tpu.models import weights as W
        from ik_llama_cpp_tpu.runtime.generate import Runtime
        from ik_llama_cpp_tpu.gguf.constants import GGMLType
        p = make_tiny_llama_gguf(tmp_path / "i8.gguf", seed=5, n_embd=256,
                                 n_head=4, n_head_kv=2, n_ff=512,
                                 quant=GGMLType.Q4_0)
        W.set_i8_mxu(True)
        try:
            rt = Runtime.from_gguf(p)
            kinds = {type(v).__name__ for b in rt.params["blocks"]
                     for kname, v in b.items()
                     if type(v).__name__.startswith("QLinear")}
            assert kinds == {"QLinearI8"}, kinds
            _, out = rt.generate("hi", max_new_tokens=4, stop_at_eos=False)
            assert len(out) == 4
        finally:
            W.set_i8_mxu(False)


def test_tuning_table_lookup(tmp_path, monkeypatch):
    """Tuning table: shape-key precedence, env override, and the tuned
    config flowing through DenseLinear without changing numerics."""
    import json
    import numpy as np
    from ik_llama_cpp_tpu.ops import tuning

    p = tmp_path / "tune.json"
    p.write_text(json.dumps({"qmatmul": {
        "m16_k64_n128": {"block_k": 512},
        "m16": {"block_n": 256}}}))
    monkeypatch.setenv("IK_TUNE_FILE", str(p))
    tuning.load(force=True)
    assert tuning.get("qmatmul", 4, 64, 128) == {"block_k": 512}
    assert tuning.get("qmatmul", 4, 64, 999) == {"block_n": 256}
    assert tuning.get("qmatmul", 4096, 64, 128) == {}
    assert tuning.get("other", 4, 64, 128) == {}
    # numerics identical with an explicit (valid) tile override
    from ik_llama_cpp_tpu.ops.qmatmul import qmatmul_ref, qmatmul
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    codes = rng.integers(-127, 128, (64, 128)).astype(np.int8)
    scale = (rng.standard_normal((2, 128)) * 0.01).astype(np.float32)
    a = qmatmul(x, codes, scale, group=32, interpret=True, block_n=256)
    b = qmatmul_ref(x, codes, scale, group=32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-2, atol=2e-2)
    monkeypatch.delenv("IK_TUNE_FILE")
    tuning.load(force=True)
