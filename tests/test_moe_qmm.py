"""Differential tests for the ragged fused dequant-matmul (quantized MoE
expert GEMM) — kernel (interpret mode) vs jnp oracle, covering group-boundary
crossings, empty groups, unaligned row counts, and decode-sized inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ik_llama_cpp_tpu.ops.moe_qmm import ragged_qmatmul, ragged_qmatmul_ref


def _mk(m, k, n, g, group, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    codes = rng.integers(-127, 128, size=(g, k, n), dtype=np.int8)
    scale = (rng.standard_normal((g, k // group, n)) * 0.02).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(codes), jnp.asarray(scale)


def _sizes(g, m, weights, seed=0):
    rng = np.random.default_rng(seed)
    w = np.asarray(weights, np.float64)
    counts = (w / w.sum() * m).astype(np.int64)
    counts[0] += m - counts.sum()
    return jnp.asarray(counts, jnp.int32)


@pytest.mark.parametrize("m,k,n,g,group,sizes", [
    (64, 64, 128, 4, 32, [1, 1, 1, 1]),        # aligned-ish even split
    (96, 64, 128, 4, 32, [5, 1, 1, 3]),        # boundary crossings
    (40, 64, 128, 4, 16, [1, 0, 2, 1]),        # empty group, m % tm != 0
    (8, 96, 128, 8, 32, [1, 0, 3, 0, 0, 2, 1, 1]),  # decode-sized, sparse
    (128, 320, 256, 3, 32, [2, 3, 1]),         # k not multiple of block
])
def test_ragged_qmatmul_matches_oracle(m, k, n, g, group, sizes):
    x, codes, scale = _mk(m, k, n, g, group)
    gs = _sizes(g, m, sizes)
    ref = ragged_qmatmul_ref(x, codes, scale, gs, group=group)
    out = ragged_qmatmul(x, codes, scale, gs, group=group,
                         block_m=32, block_n=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_qmatmul_single_group_equals_qmatmul():
    """One group with all rows == plain fused dequant matmul."""
    from ik_llama_cpp_tpu.ops.qmatmul import qmatmul_ref
    m, k, n, group = 48, 64, 128, 32
    x, codes, scale = _mk(m, k, n, 1, group, seed=3)
    gs = jnp.asarray([m], jnp.int32)
    out = ragged_qmatmul(x, codes, scale, gs, group=group,
                         block_m=32, block_n=128, block_k=64, interpret=True)
    ref = qmatmul_ref(x, codes[0], scale[0], group=group)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_qmatmul_padding_rows_ignored():
    """Rows beyond sum(group_sizes) must not affect covered rows."""
    m, k, n, g, group = 37, 64, 128, 4, 32
    x, codes, scale = _mk(m, k, n, g, group, seed=5)
    gs = jnp.asarray([10, 0, 20, 2], jnp.int32)  # covers 32 of 37 rows
    out = ragged_qmatmul(x, codes, scale, gs, group=group,
                         block_m=16, block_n=128, block_k=64, interpret=True)
    ref = ragged_qmatmul_ref(x[:32], codes, scale, gs, group=group)
    np.testing.assert_allclose(np.asarray(out)[:32], np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_ffn_quant_matches_dense():
    """moe_ffn with QuantExpertWeights == moe_ffn with the dequantized bf16
    experts (same routing, same numerics contract)."""
    from ik_llama_cpp_tpu.ops.moe import (ExpertWeights, QuantExpertWeights,
                                          moe_ffn)
    rng = np.random.default_rng(11)
    t, e, ff, g, k, group = 12, 64, 96, 8, 2, 32
    x = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, g)).astype(np.float32))

    def q(shape_k, shape_n):
        codes = rng.integers(-127, 128, (g, shape_k, shape_n), np.int8)
        scale = (rng.standard_normal((g, shape_k // group, shape_n)) * 0.02
                 ).astype(np.float32)
        return jnp.asarray(codes), jnp.asarray(scale)

    gc, gs = q(e, ff)
    uc, us = q(e, ff)
    dc, ds = q(ff, e)
    qew = QuantExpertWeights(gate=gc, gate_s=gs, up=uc, up_s=us,
                             down=dc, down_s=ds)

    def deq(c, s):
        return (c.astype(jnp.bfloat16)
                * jnp.repeat(s, group, axis=1).astype(jnp.bfloat16))

    ew = ExpertWeights(gate=deq(gc, gs), up=deq(uc, us), down=deq(dc, ds))

    out_q = moe_ffn(x, logits, qew, k)
    out_d = moe_ffn(x, logits, ew, k)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)
