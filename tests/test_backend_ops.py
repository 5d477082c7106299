"""Differential op sweep — the analogue of tests/test-backend-ops.cpp:
each op runs on randomized inputs against an independent (naive jnp/numpy)
oracle and must agree within NMSE-style tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ik_llama_cpp_tpu.ops.moe import (ExpertWeights, GATING_SIGMOID,
                                      GATING_SOFTMAX, moe_ffn, route)
from ik_llama_cpp_tpu.ops.qmatmul import qmatmul, qmatmul_ref
from ik_llama_cpp_tpu.ops import layers as L


def nmse(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(((a - b) ** 2).sum() / max((b ** 2).sum(), 1e-12))


# ---------------------------------------------------------------- qmatmul
@pytest.mark.parametrize("m,k,n,g", [
    (1, 256, 128, 32), (7, 320, 160, 16), (64, 512, 96, 32),
    (130, 256, 512, 32), (16, 1024, 64, 64),
])
def test_qmatmul_sweep(m, k, n, g):
    key = jax.random.PRNGKey(m * 1000 + n)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    codes = jax.random.randint(key, (k, n), -127, 128, dtype=jnp.int8)
    scale = (jax.random.normal(key, (k // g, n)) * 0.02).astype(jnp.float32)
    got = qmatmul(x, codes, scale, group=g, interpret=True)
    ref = qmatmul_ref(x, codes, scale, group=g)
    assert nmse(got, ref) < 1e-6


# ------------------------------------------------------------------- MoE
def _naive_moe(x, router, ew: ExpertWeights, k, gating, norm_topk, scale,
               sel_bias, activation):
    """Independent per-token loop oracle."""
    w, idx = route(jnp.asarray(router), k, gating=gating, norm_topk=norm_topk,
                   scale=scale, selection_bias=sel_bias)
    w, idx = np.asarray(w, np.float64), np.asarray(idx)
    x = np.asarray(x, np.float64)
    gate = np.asarray(ew.gate, np.float64)
    up = np.asarray(ew.up, np.float64)
    down = np.asarray(ew.down, np.float64)
    out = np.zeros((x.shape[0], down.shape[2]))
    for ti in range(x.shape[0]):
        for j in range(k):
            e = int(idx[ti, j])
            g = x[ti] @ gate[e]
            u = x[ti] @ up[e]
            if ew.gate_b is not None:
                g = g + np.asarray(ew.gate_b, np.float64)[e]
            if ew.up_b is not None:
                u = u + np.asarray(ew.up_b, np.float64)[e]
            if activation == "swiglu_oai":
                gc = np.minimum(g, 7.0)
                uc = np.clip(u, -7.0, 7.0)
                h = gc / (1 + np.exp(-1.702 * gc)) * (uc + 1.0)
            elif activation == "silu":
                h = g / (1 + np.exp(-g)) * u
            else:
                import scipy.special  # noqa
                h = g * u  # unused
            y = h @ down[e]
            if ew.down_b is not None:
                y = y + np.asarray(ew.down_b, np.float64)[e]
            out[ti] += w[ti, j] * y
    return out


@pytest.mark.parametrize("gating,norm_topk,biased,act", [
    (GATING_SOFTMAX, False, False, "silu"),
    (GATING_SOFTMAX, True, False, "silu"),
    (GATING_SIGMOID, True, False, "silu"),
    (3, False, True, "swiglu_oai"),       # gpt-oss combination
])
def test_moe_vs_naive_oracle(gating, norm_topk, biased, act):
    key = jax.random.PRNGKey(3)
    T, E, FF, NE, K = 9, 32, 48, 4, 2
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (T, E), jnp.float32) * 0.5
    router = jax.random.normal(ks[1], (T, NE), jnp.float32)
    ew = ExpertWeights(
        gate=jax.random.normal(ks[2], (NE, E, FF), jnp.float32) * 0.1,
        up=jax.random.normal(ks[3], (NE, E, FF), jnp.float32) * 0.1,
        down=jax.random.normal(ks[4], (NE, FF, E), jnp.float32) * 0.1,
        gate_b=jax.random.normal(ks[5], (NE, FF), jnp.float32) * 0.1 if biased else None,
        up_b=jax.random.normal(ks[6], (NE, FF), jnp.float32) * 0.1 if biased else None,
        down_b=jax.random.normal(ks[7], (NE, E), jnp.float32) * 0.1 if biased else None,
    )
    got = moe_ffn(x, router, ew, K, gating=gating, norm_topk=norm_topk,
                  activation=act)
    ref = _naive_moe(x, router, ew, K, gating, norm_topk, 1.0, None, act)
    assert nmse(got, ref) < 1e-5


# ------------------------------------------------------------------ rope
def test_rope_norm_matches_complex_rotation():
    """NORM rope == rotation of consecutive pairs by theta_i = p/base^(2i/d)."""
    pos = jnp.asarray([[3, 7]], jnp.int32)
    d = 8
    cos, sin = L.rope_cache(pos, d, 10000.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, d), jnp.float32)
    got = np.asarray(L.apply_rope(x, cos, sin, L.ROPE_TYPE_NORM))
    for t, p in enumerate([3, 7]):
        for i in range(d // 2):
            theta = p / (10000.0 ** (i / (d // 2)))
            c, s = np.cos(theta), np.sin(theta)
            x0, x1 = np.asarray(x)[0, t, 0, 2 * i], np.asarray(x)[0, t, 0, 2 * i + 1]
            np.testing.assert_allclose(got[0, t, 0, 2 * i], x0 * c - x1 * s, atol=1e-4)
            np.testing.assert_allclose(got[0, t, 0, 2 * i + 1], x1 * c + x0 * s, atol=1e-4)


def test_rope_neox_rotates_halves():
    pos = jnp.asarray([[5]], jnp.int32)
    d = 8
    cos, sin = L.rope_cache(pos, d, 10000.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, d), jnp.float32)
    got = np.asarray(L.apply_rope(x, cos, sin, L.ROPE_TYPE_NEOX))
    half = d // 2
    for i in range(half):
        theta = 5 / (10000.0 ** (i / half))
        c, s = np.cos(theta), np.sin(theta)
        x0, x1 = np.asarray(x)[0, 0, 0, i], np.asarray(x)[0, 0, 0, i + half]
        np.testing.assert_allclose(got[0, 0, 0, i], x0 * c - x1 * s, atol=1e-4)
        np.testing.assert_allclose(got[0, 0, 0, i + half], x1 * c + x0 * s, atol=1e-4)


# ------------------------------------------------------------------ norms
def test_rms_norm_oracle():
    x = np.random.default_rng(0).standard_normal((3, 5, 32)).astype(np.float32)
    w = np.random.default_rng(1).standard_normal(32).astype(np.float32)
    got = np.asarray(L.rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-5))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * w
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_layer_norm_oracle():
    x = np.random.default_rng(2).standard_normal((4, 16)).astype(np.float32)
    w = np.random.default_rng(3).standard_normal(16).astype(np.float32)
    b = np.random.default_rng(4).standard_normal(16).astype(np.float32)
    got = np.asarray(L.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-5))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mu) / np.sqrt(var + 1e-5) * w + b
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_softcap():
    x = jnp.linspace(-100, 100, 64)
    y = np.asarray(L.softcap(x, 30.0))
    assert y.max() <= 30.0 and y.min() >= -30.0
    np.testing.assert_allclose(y, 30.0 * np.tanh(np.asarray(x) / 30.0), rtol=1e-6)


# ------------------------------------------------------------- delta-net
@pytest.mark.parametrize("gqa,repeat_type", [(1, 0), (2, 0), (2, 1)])
def test_delta_net_vs_oracle(gqa, repeat_type):
    from ik_llama_cpp_tpu.ops.delta_net import delta_net, delta_net_ref
    key = jax.random.PRNGKey(7)
    B, T, H, D = 2, 6, 4, 16
    HKQ = H // gqa
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, HKQ, D)) * 0.5
    k = jax.random.normal(ks[1], (B, T, HKQ, D)) * 0.5
    v = jax.random.normal(ks[2], (B, T, H, D)) * 0.5
    g = -jnp.abs(jax.random.normal(ks[3], (B, T, H))) * 0.5   # log-decay <= 0
    beta = jax.random.normal(ks[4], (B, T, H))
    state = jax.random.normal(ks[5], (B, H, D, D)) * 0.1

    out, s_new = delta_net(q, k, v, g, beta, state, repeat_type=repeat_type)
    ref_out, ref_s = delta_net_ref(q, k, v, g, beta, state,
                                   repeat_type=repeat_type)
    assert nmse(out, ref_out) < 1e-9
    assert nmse(s_new, ref_s) < 1e-9


def test_delta_net_state_carry():
    """Running two halves sequentially == running the whole sequence."""
    from ik_llama_cpp_tpu.ops.delta_net import delta_net
    key = jax.random.PRNGKey(9)
    B, T, H, D = 1, 8, 2, 8
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (B, T, H, D))
    k = jax.random.normal(ks[1], (B, T, H, D))
    v = jax.random.normal(ks[2], (B, T, H, D))
    g = -jnp.abs(jax.random.normal(ks[3], (B, T, H)))
    beta = jax.random.normal(ks[4], (B, T, H))
    s0 = jnp.zeros((B, H, D, D))

    full, s_full = delta_net(q, k, v, g, beta, s0)
    h1, s_mid = delta_net(q[:, :4], k[:, :4], v[:, :4], g[:, :4],
                          beta[:, :4], s0)
    h2, s_end = delta_net(q[:, 4:], k[:, 4:], v[:, 4:], g[:, 4:],
                          beta[:, 4:], s_mid)
    np.testing.assert_allclose(np.concatenate([h1, h2], 1), np.asarray(full),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_end), np.asarray(s_full),
                               rtol=1e-5, atol=1e-5)
