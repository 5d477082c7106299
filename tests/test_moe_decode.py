"""Differential tests for the decode-specialized fused MoE kernels
(ops/moe_decode.py) — kernel (interpret mode) vs jnp oracle, plus
moe_ffn-level equivalence between the decode path and the ragged PP path.

The reference analogue is the iqk_moe_fused_up_gate TG path (ggml.c:18593)
compared against the generic mul_mat_id path in test-backend-ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ik_llama_cpp_tpu.ops.moe import (GATING_SIGMOID, GATING_SOFTMAX,
                                      QuantExpertWeights, moe_ffn)
from ik_llama_cpp_tpu.ops.moe_decode import (moe_decode_down,
                                             moe_decode_gate_up,
                                             moe_decode_ref)


def _mk_experts(g, k, f, group=32, seed=0, bias=False):
    rng = np.random.default_rng(seed)

    def q(shape_k, shape_n):
        codes = rng.integers(-127, 128, size=(g, shape_k, shape_n),
                             dtype=np.int8)
        scale = (rng.standard_normal((g, shape_k // group, shape_n))
                 * 0.02).astype(np.float32)
        return jnp.asarray(codes), jnp.asarray(scale)

    gc, gs = q(k, f)
    uc, us = q(k, f)
    dc, ds = q(f, k)
    kw = {}
    if bias:
        kw = dict(
            gate_b=jnp.asarray(rng.standard_normal((g, f)), jnp.float32),
            up_b=jnp.asarray(rng.standard_normal((g, f)), jnp.float32),
            down_b=jnp.asarray(rng.standard_normal((g, k)), jnp.float32),
        )
    return QuantExpertWeights(gc, gs, uc, us, dc, ds, gate_group=group,
                              up_group=group, down_group=group, **kw)


@pytest.mark.parametrize("t,topk,g,k,f,group", [
    (1, 4, 8, 128, 96, 32),       # single-token decode
    (4, 2, 8, 96, 64, 32),        # small spec-verify batch
    (2, 3, 5, 320, 160, 32),      # unaligned dims, odd top_k
])
def test_gate_up_matches_oracle(t, topk, g, k, f, group):
    rng = np.random.default_rng(1)
    ew = _mk_experts(g, k, f, group)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, (t, topk)), jnp.int32)
    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), topk, axis=0)
    h = moe_decode_gate_up(xp, ids, ew.gate, ew.gate_s, ew.up, ew.up_s,
                           group=group, block_k=64, block_f=128,
                           interpret=True)

    def dq(codes, scale):
        s = jnp.repeat(scale, group, axis=1).astype(jnp.bfloat16)
        return codes.astype(jnp.bfloat16) * s

    gate = dq(ew.gate[ids], ew.gate_s[ids])
    up = dq(ew.up[ids], ew.up_s[ids])
    gg = jnp.einsum("pk,pkf->pf", xp, gate,
                    preferred_element_type=jnp.float32)
    uu = jnp.einsum("pk,pkf->pf", xp, up,
                    preferred_element_type=jnp.float32)
    ref = ((gg * jax.nn.sigmoid(gg)) * uu).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("t,topk,g,f,e,group", [
    (1, 4, 8, 96, 128, 32),
    (3, 2, 6, 320, 192, 32),
])
def test_down_matches_oracle(t, topk, g, f, e, group):
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.integers(-127, 128, (g, f, e), np.int8))
    scale = jnp.asarray(rng.standard_normal((g, f // group, e)) * 0.02,
                        jnp.float32)
    hw = jnp.asarray(rng.standard_normal((t * topk, f)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, g, t * topk), jnp.int32)
    out = moe_decode_down(hw, ids, codes, scale, top_k=topk, group=group,
                          block_f=64, block_e=128, interpret=True)
    s = jnp.repeat(scale, group, axis=1).astype(jnp.bfloat16)
    w = (codes.astype(jnp.bfloat16) * s)[ids]
    y = jnp.einsum("pf,pfe->pe", hw, w, preferred_element_type=jnp.float32)
    ref = y.reshape(t, topk, e).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gating,bias,wbf", [
    (GATING_SOFTMAX, False, False),
    (GATING_SIGMOID, True, False),    # gpt-oss-style expert biases
    (GATING_SIGMOID, False, True),    # llama4 weight_before_ffn
])
def test_moe_ffn_decode_path_matches_ragged(gating, bias, wbf):
    """moe_ffn at t<=8 (decode kernel path / CPU oracle) must agree with the
    ragged PP path on the same inputs."""
    t, g, k, f, topk, group = 2, 8, 128, 96, 3, 32
    rng = np.random.default_rng(5)
    ew = _mk_experts(g, k, f, group, bias=bias)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.3, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((t, g)), jnp.float32)
    act = "swiglu_oai" if bias else "silu"
    kw = dict(gating=gating, activation=act, weight_before_ffn=wbf)
    out_decode = moe_ffn(x, logits, ew, topk, **kw)

    # ragged path: replicate tokens past the decode threshold
    reps = 5
    xr = jnp.tile(x, (reps, 1))
    lr = jnp.tile(logits, (reps, 1))
    out_ragged = moe_ffn(xr, lr, ew, topk, **kw)[:t]
    # the two paths use different accumulation orders (bf16 h pre-weighting
    # vs f32 output weighting) — compare by normalized error like the
    # reference's ggml_backend_compare_graph_backend NMSE check
    a, b = np.asarray(out_decode, np.float64), np.asarray(out_ragged,
                                                          np.float64)
    nmse = np.sum((a - b) ** 2) / max(np.sum(b ** 2), 1e-12)
    assert nmse < 1e-4, nmse


def test_decode_ref_matches_kernels_end_to_end():
    """oracle (moe_decode_ref) vs the two kernels chained, silu path."""
    t, topk, g, k, f, group = 2, 3, 6, 128, 96, 32
    rng = np.random.default_rng(7)
    ew = _mk_experts(g, k, f, group)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.random((t, topk)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, (t, topk)), jnp.int32)

    ref = moe_decode_ref(x, w, idx, ew)

    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), topk, axis=0)
    h = moe_decode_gate_up(xp, ids, ew.gate, ew.gate_s, ew.up, ew.up_s,
                           group=group, block_k=64, block_f=128,
                           interpret=True)
    hw = (h.astype(jnp.float32) * w.reshape(-1)[:, None]).astype(
        jnp.bfloat16)
    out = moe_decode_down(hw, ids, ew.down, ew.down_s, top_k=topk,
                          group=group, block_f=64, block_e=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# int8 MXU decode kernels (supergroup-256 experts, round 5)
# ---------------------------------------------------------------------------

from ik_llama_cpp_tpu.ops.moe_decode import (moe_decode_down_i8,
                                             moe_decode_gate_up_i8,
                                             moe_decode_i8_ref)
from ik_llama_cpp_tpu.ops.qmatmul import SUPERGROUP, quantize_activations


def _mk_experts_sg(g, k, f, seed=0, bias=False):
    """Supergroup-256 experts: int8 codes + positive f32 (K/256, N) scales."""
    rng = np.random.default_rng(seed)

    def q(kk, nn):
        codes = rng.integers(-127, 128, size=(g, kk, nn), dtype=np.int8)
        scale = (np.abs(rng.standard_normal(
            (g, kk // SUPERGROUP, nn))) * 0.02 + 1e-4).astype(np.float32)
        return jnp.asarray(codes), jnp.asarray(scale)

    gc, gs = q(k, f)
    uc, us = q(k, f)
    dc, ds = q(f, k)
    kw = {}
    if bias:
        kw = dict(
            gate_b=jnp.asarray(rng.standard_normal((g, f)), jnp.float32),
            up_b=jnp.asarray(rng.standard_normal((g, f)), jnp.float32),
            down_b=jnp.asarray(rng.standard_normal((g, k)), jnp.float32),
        )
    return QuantExpertWeights(gc, gs, uc, us, dc, ds,
                              gate_group=SUPERGROUP, up_group=SUPERGROUP,
                              down_group=SUPERGROUP, **kw)


@pytest.mark.parametrize("t,topk,g,k,f", [
    (1, 4, 6, 512, 256),       # single-token decode
    (3, 2, 5, 256, 512),       # small batch, padding on K
])
def test_gate_up_i8_matches_oracle(t, topk, g, k, f):
    rng = np.random.default_rng(11)
    ew = _mk_experts_sg(g, k, f)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, (t, topk)), jnp.int32)
    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), topk, axis=0)
    xq, xs = quantize_activations(xp)
    h = moe_decode_gate_up_i8(xq, xs.T, ids, ew.gate, ew.gate_s,
                              ew.up, ew.up_s, block_k=512, block_f=256,
                              interpret=True)

    def i8mm(codes, sw):
        nsg = k // SUPERGROUP
        qg = xq.astype(jnp.int32).reshape(-1, nsg, SUPERGROUP)
        wg = codes[ids].astype(jnp.int32).reshape(-1, nsg, SUPERGROUP, f)
        part = jnp.einsum("pgs,pgsn->pgn", qg, wg).astype(jnp.float32)
        return jnp.einsum("pgn,pg,pgn->pn", part, xs.astype(jnp.float32),
                          sw[ids].astype(jnp.float32))

    gg = i8mm(ew.gate, ew.gate_s)
    uu = i8mm(ew.up, ew.up_s)
    ref = ((gg * jax.nn.sigmoid(gg)) * uu).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(h, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_down_i8_matches_oracle():
    t, topk, g, f, e = 2, 3, 6, 512, 384
    rng = np.random.default_rng(12)
    codes = jnp.asarray(rng.integers(-127, 128, (g, f, e), np.int8))
    scale = jnp.asarray(
        np.abs(rng.standard_normal((g, f // SUPERGROUP, e))) * 0.02 + 1e-4,
        jnp.float32)
    hw = jnp.asarray(rng.standard_normal((t * topk, f)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, g, t * topk), jnp.int32)
    hq, hs = quantize_activations(hw)
    out = moe_decode_down_i8(hq, hs.T, ids, codes, scale, top_k=topk,
                             block_f=512, block_e=128, interpret=True)
    nsg = f // SUPERGROUP
    qg = hq.astype(jnp.int32).reshape(-1, nsg, SUPERGROUP)
    wg = codes[ids].astype(jnp.int32).reshape(-1, nsg, SUPERGROUP, e)
    part = jnp.einsum("pgs,pgsn->pgn", qg, wg).astype(jnp.float32)
    y = jnp.einsum("pgn,pg,pgn->pn", part, hs.astype(jnp.float32),
                   scale[ids].astype(jnp.float32))
    ref = y.reshape(t, topk, e).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("bias,wbf", [(False, False), (True, False),
                                      (False, True)])
def test_i8_ref_matches_i8_kernels_end_to_end(bias, wbf):
    t, topk, g, k, f = 2, 3, 6, 256, 256
    rng = np.random.default_rng(13)
    ew = _mk_experts_sg(g, k, f, bias=bias)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.random((t, topk)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, (t, topk)), jnp.int32)
    act = "swiglu_oai" if bias else "silu"

    ref = moe_decode_i8_ref(x, w, idx, ew, activation=act,
                            weight_before_ffn=wbf)

    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), topk, axis=0)
    if wbf:
        xp = xp * w.reshape(-1)[:, None].astype(jnp.bfloat16)
    xq, xs = quantize_activations(xp)
    h = moe_decode_gate_up_i8(xq, xs.T, ids, ew.gate, ew.gate_s,
                              ew.up, ew.up_s, gate_b=ew.gate_b, up_b=ew.up_b,
                              activation=act, block_k=512, block_f=256,
                              interpret=True)
    if not wbf:
        h = (h.astype(jnp.float32) * w.reshape(-1)[:, None]).astype(
            jnp.bfloat16)
    hq, hs = quantize_activations(h)
    out = moe_decode_down_i8(hq, hs.T, ids, ew.down, ew.down_s, top_k=topk,
                             block_f=512, block_e=128, interpret=True)
    if ew.down_b is not None:
        db = ew.down_b[ids].reshape(t, topk, -1).astype(jnp.float32)
        out = out + (jnp.sum(db, axis=1) if wbf
                     else jnp.sum(db * w[:, :, None], axis=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_moe_ffn_i8_decode_matches_ragged_sg():
    """moe_ffn with supergroup experts: decode path (i8 oracle on CPU) vs
    ragged PP path with group=256 must agree to quantization tolerance."""
    t, g, k, f, topk = 2, 6, 256, 256, 3
    rng = np.random.default_rng(14)
    ew = _mk_experts_sg(g, k, f)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.3, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((t, g)), jnp.float32)
    out_decode = moe_ffn(x, logits, ew, topk)
    reps = 5
    out_ragged = moe_ffn(jnp.tile(x, (reps, 1)), jnp.tile(logits, (reps, 1)),
                         ew, topk)[:t]
    a = np.asarray(out_decode, np.float64)
    b = np.asarray(out_ragged, np.float64)
    nmse = np.sum((a - b) ** 2) / max(np.sum(b ** 2), 1e-12)
    # int8 activation quantization carries ~(1/127)^2 = 6e-5 NMSE per
    # matmul; two chained matmuls + bf16 h rounding land around 5e-4 —
    # the same order as the reference's own Q8_K-activation error budget
    # (test-quantize-fns.cpp dot tolerance 0.02 ~ 4e-4 NMSE)
    assert nmse < 2e-3, nmse


@pytest.mark.parametrize("t,bias,wbf", [(1, False, False), (2, True, False),
                                        (2, False, True)])
def test_fused_i8_matches_i8_ref(t, bias, wbf):
    """Single-kernel fused decode path vs the i8 oracle (bit-level numerics:
    same quantize chain, same bf16 rounding points)."""
    from ik_llama_cpp_tpu.ops.moe_decode import moe_decode_fused_i8
    topk, g, k, f = 3, 6, 256, 256
    rng = np.random.default_rng(21)
    ew = _mk_experts_sg(g, k, f, bias=bias)
    x = jnp.asarray(rng.standard_normal((t, k)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.random((t, topk)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, g, (t, topk)), jnp.int32)
    act = "swiglu_oai" if bias else "silu"

    ref = moe_decode_i8_ref(x, w, idx, ew, activation=act,
                            weight_before_ffn=wbf)

    ids = idx.reshape(-1)
    xp = jnp.repeat(x.astype(jnp.bfloat16), topk, axis=0)
    if wbf:
        xp = xp * w.reshape(-1)[:, None].astype(jnp.bfloat16)
    xq, xs = quantize_activations(xp)
    wvec = (jnp.ones((t * topk,), jnp.float32) if wbf
            else w.reshape(-1).astype(jnp.float32))
    out = moe_decode_fused_i8(xq, xs.T, ids, wvec, ew.gate, ew.gate_s,
                              ew.up, ew.up_s, ew.down, ew.down_s,
                              gate_b=ew.gate_b, up_b=ew.up_b, top_k=topk,
                              activation=act, interpret=True)
    assert out is not None
    if ew.down_b is not None:
        db = ew.down_b[ids].reshape(t, topk, -1).astype(jnp.float32)
        out = out + (jnp.sum(db, axis=1) if wbf
                     else jnp.sum(db * w[:, :, None], axis=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_i8_falls_back_on_big_slabs():
    """Slab sets beyond the VMEM budget return None (two-kernel fallback)."""
    from ik_llama_cpp_tpu.ops.moe_decode import moe_decode_fused_i8
    k, f, e = 4096, 14336, 4096   # mixtral-class expert: 56 MB gate alone
    xq = jnp.zeros((2, k), jnp.int8)
    xs = jnp.zeros((k // SUPERGROUP, 2), jnp.float32)
    ids = jnp.zeros((2,), jnp.int32)
    w = jnp.ones((2,), jnp.float32)
    z = lambda *s: jnp.zeros(s, jnp.int8)
    zs = lambda *s: jnp.zeros(s, jnp.float32)
    out = moe_decode_fused_i8(
        xq, xs, ids, w, z(1, k, f), zs(1, k // 256, f), z(1, k, f),
        zs(1, k // 256, f), z(1, f, e), zs(1, f // 256, e), top_k=2,
        interpret=True)
    assert out is None
