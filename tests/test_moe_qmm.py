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


def _mk_i8(m, k, n, g, seed=0):
    from ik_llama_cpp_tpu.ops.qmatmul import quantize_activations
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((m, k)).astype(np.float32)
    codes = rng.integers(-127, 128, size=(g, k, n), dtype=np.int8)
    sw = (np.abs(rng.standard_normal((g, k // 256, n))) * 0.02 + 1e-4
          ).astype(np.float32)
    xq, xs = quantize_activations(jnp.asarray(x, jnp.bfloat16))
    return xq, xs, jnp.asarray(codes), jnp.asarray(sw)


@pytest.mark.parametrize("m,k,n,g,sizes", [
    (64, 256, 128, 4, [1, 1, 1, 1]),           # even split
    (96, 256, 128, 4, [5, 1, 1, 3]),           # tile boundary crossings
    (40, 512, 128, 4, [1, 0, 2, 1]),           # empty group, odd row count
    (8, 256, 128, 8, [1, 0, 3, 0, 0, 2, 1, 1]),  # decode-sized, sparse
])
def test_ragged_qmatmul_i8_matches_oracle(m, k, n, g, sizes):
    """int8 supergroup ragged kernel (interpret) vs exact-int-dot oracle."""
    from ik_llama_cpp_tpu.ops.moe_qmm import (ragged_qmatmul_i8,
                                              ragged_qmatmul_i8_ref)
    xq, xs, codes, sw = _mk_i8(m, k, n, g)
    gs = _sizes(g, m, sizes)
    ref = ragged_qmatmul_i8_ref(xq, xs, codes, sw, gs)
    out = ragged_qmatmul_i8(xq, xs.T, codes, sw, gs,
                            block_m=128, block_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ragged_qmatmul_i8_multi_ktile():
    """K spanning several 2048-wide tiles exercises the accumulator sweep."""
    from ik_llama_cpp_tpu.ops.moe_qmm import (ragged_qmatmul_i8,
                                              ragged_qmatmul_i8_ref)
    m, k, n, g = 32, 4096, 128, 3
    xq, xs, codes, sw = _mk_i8(m, k, n, g, seed=7)
    gs = jnp.asarray([10, 2, 20], jnp.int32)
    ref = ragged_qmatmul_i8_ref(xq, xs, codes, sw, gs)
    out = ragged_qmatmul_i8(xq, xs.T, codes, sw, gs,
                            block_m=128, block_n=128, block_k=2048,
                            interpret=True)
    # k-tile sweep reorders the f32 correction accumulation vs the oracle's
    # single einsum — tolerance covers that reassociation, nothing else
    np.testing.assert_allclose(np.asarray(out)[:32], np.asarray(ref)[:32],
                               rtol=2e-4, atol=1e-4)


def test_moe_ffn_supergroup_prefill_matches_decode_path():
    """moe_ffn PREFILL (t>8, supergroup experts -> i8 ragged path) must agree
    with the decode i8 oracle on the same tokens — the two paths share the
    activation-quant + exact-int-dot numerics contract."""
    from ik_llama_cpp_tpu.ops.moe import QuantExpertWeights, moe_ffn, route
    from ik_llama_cpp_tpu.ops.moe_decode import SUPERGROUP, moe_decode_i8_ref
    rng = np.random.default_rng(13)
    t, e, ff, g, k = 16, 256, 512, 8, 2
    x = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((t, g)).astype(np.float32))

    def q(kk, nn):
        codes = rng.integers(-127, 128, (g, kk, nn), np.int8)
        sw = (np.abs(rng.standard_normal((g, kk // SUPERGROUP, nn))) * 0.02
              + 1e-4).astype(np.float32)
        return jnp.asarray(codes), jnp.asarray(sw)

    gc, gs_ = q(e, ff)
    uc, us = q(e, ff)
    dc, ds = q(ff, e)
    qew = QuantExpertWeights(gate=gc, gate_s=gs_, up=uc, up_s=us,
                             down=dc, down_s=ds,
                             gate_group=SUPERGROUP, up_group=SUPERGROUP,
                             down_group=SUPERGROUP)
    out = moe_ffn(x, logits, qew, k)
    w, idx = route(logits, k)
    ref = moe_decode_i8_ref(x, w, idx, qew)
    # the two paths quantize h at different points (decode folds the routing
    # weight in BEFORE the int8 re-quant, prefill applies it after the down
    # projection), so per-element they agree only to within the
    # per-supergroup activation-quant step, amplified by cancellation in the
    # FF-dim sum. The tolerance is that quant noise; real dispatch bugs
    # (wrong expert, wrong scale row) produce ~100% error and still trip it.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.12, atol=400.0)


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


# ---------------------------------------------------------------------------
# Capacity-bucketed fused prefill (round 5)
# ---------------------------------------------------------------------------

def _mk_sg_experts(g, k, f, e, seed=0):
    import numpy as np
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.ops.moe import QuantExpertWeights
    rng = np.random.default_rng(seed)

    def q(kk, nn):
        codes = rng.integers(-127, 128, size=(g, kk, nn), dtype=np.int8)
        scale = (np.abs(rng.standard_normal(
            (g, kk // 256, nn))) * 0.02 + 1e-4).astype(np.float32)
        return jnp.asarray(codes), jnp.asarray(scale)

    gc, gs = q(k, f)
    uc, us = q(k, f)
    dc, ds = q(f, e)
    return QuantExpertWeights(gc, gs, uc, us, dc, ds, gate_group=256,
                              up_group=256, down_group=256)


@pytest.mark.parametrize("sizes", [
    [5, 0, 9, 2, 0, 8],          # empty experts + uneven
    [24, 0, 0, 0, 0, 0],         # heavy skew: one expert overflows R
    [4, 4, 4, 4, 4, 4],          # uniform
])
def test_fused_prefill_matches_ragged_chain(sizes):
    """Capacity-bucketed fused prefill (+ overflow pass) vs the plain
    3-call i8 ragged chain — identical numerics by construction."""
    import numpy as np
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.ops.moe import _fused_prefill_try, _apply_moe_act
    from ik_llama_cpp_tpu.ops.moe_qmm import ragged_qmatmul_i8_ref
    from ik_llama_cpp_tpu.ops.qmatmul import quantize_activations
    g, k, f, e = 6, 256, 256, 256
    m = sum(sizes)
    rng = np.random.default_rng(31)
    ew = _mk_sg_experts(g, k, f, e, seed=7)
    xs = jnp.asarray(rng.standard_normal((m, k)) * 0.5, jnp.bfloat16)
    gsz = jnp.asarray(sizes, jnp.int32)

    got = _fused_prefill_try(xs, gsz, ew, "silu", 0.0, interpret=True)
    assert got is not None

    xq, xsc = quantize_activations(xs)
    gg = ragged_qmatmul_i8_ref(xq, xsc, ew.gate, ew.gate_s, gsz)
    uu = ragged_qmatmul_i8_ref(xq, xsc, ew.up, ew.up_s, gsz)
    h = _apply_moe_act(gg, uu, "silu", 0.0)
    hq, hs = quantize_activations(h.astype(jnp.bfloat16))
    ref = ragged_qmatmul_i8_ref(hq, hs, ew.down, ew.down_s, gsz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_prefill_bails_on_big_slabs():
    import numpy as np
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.ops.moe import _fused_prefill_try
    ew = _mk_sg_experts(1, 4096, 14336, 4096, seed=1)   # mixtral-class
    xs = jnp.zeros((4, 4096), jnp.bfloat16)
    out = _fused_prefill_try(xs, jnp.asarray([4], jnp.int32), ew,
                             "silu", 0.0, interpret=True)
    assert out is None
