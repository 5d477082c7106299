"""Gated delta-net recurrence (Qwen3-Next linear attention) — the TPU
analogue of GGML_OP_DELTA_NET (ggml.c ggml_compute_forward_delta_net_f32)
and iqk_fused_delta_net.

Per head with state S (Dv, Dk), per token:
    qn = q/||q||, kn = k/||k||, scale = 1/sqrt(D)
    beta = sigmoid(beta_raw); decay = exp(min(g, 50))
    attn  = kn . (qn * scale)
    v'    = S @ k            (raw k)
    out0  = S @ q            (raw q)
    v_new = beta * v - beta * decay * v' / ||k||
    out   = out0 * decay * scale / ||q|| + v_new * attn
    S     = clip(decay * S + v_new kn^T, +-1e6)

Implemented as a `lax.scan` over tokens with all (batch, head, dim) axes
vectorized — each step is a couple of (B,H,D,D) contractions, which XLA maps
onto the MXU; the sequential dependency is inherent to the recurrence.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-12
CLIP = 1e6


def delta_net(q, k, v, g, beta, state, *, repeat_type: int = 0):
    """q, k: (B, T, Hkq, D); v: (B, T, H, D); g, beta: (B, T, H);
    state: (B, H, Dv=D, Dk=D). Returns (out (B, T, H, D), new_state).

    GQA: H % Hkq == 0; repeat_type 0 maps v-head h to kq-head h // ratio
    (the reference's repeat_type 0; type 1 uses h % Hkq)."""
    b, t, hkq, d = q.shape
    h = v.shape[2]
    ratio = h // hkq
    if ratio > 1:
        if repeat_type == 0:
            q = jnp.repeat(q, ratio, axis=2)
            k = jnp.repeat(k, ratio, axis=2)
        else:
            q = jnp.tile(q, (1, 1, ratio, 1))
            k = jnp.tile(k, (1, 1, ratio, 1))

    scale = 1.0 / np.sqrt(d)

    def step(S, inp):
        q_t, k_t, v_t, g_t, b_t = inp          # (B,H,D) / (B,H)
        q_t = q_t.astype(jnp.float32)
        k_t = k_t.astype(jnp.float32)
        v_t = v_t.astype(jnp.float32)
        qn_inv = jax.lax.rsqrt(jnp.sum(q_t * q_t, -1) + EPS)     # (B,H)
        kn_inv = jax.lax.rsqrt(jnp.sum(k_t * k_t, -1) + EPS)
        beta_v = jax.nn.sigmoid(b_t.astype(jnp.float32))
        decay = jnp.exp(jnp.minimum(g_t.astype(jnp.float32), 50.0))
        attn = jnp.sum(k_t * q_t, -1) * kn_inv * qn_inv * scale  # (B,H)

        v_prime = jnp.einsum("bhrc,bhc->bhr", S, k_t)
        out0 = jnp.einsum("bhrc,bhc->bhr", S, q_t)
        v_new = (beta_v[..., None] * v_t
                 - (beta_v * decay * kn_inv)[..., None] * v_prime)
        out = (out0 * (decay * qn_inv)[..., None] * scale
               + v_new * attn[..., None])
        kn = k_t * kn_inv[..., None]
        S = decay[..., None, None] * S + v_new[..., :, None] * kn[..., None, :]
        S = jnp.clip(S, -CLIP, CLIP)
        return S, out

    inputs = (q.swapaxes(0, 1), k.swapaxes(0, 1), v.swapaxes(0, 1),
              g.swapaxes(0, 1), beta.swapaxes(0, 1))
    new_state, outs = jax.lax.scan(step, state.astype(jnp.float32), inputs)
    return outs.swapaxes(0, 1), new_state


def delta_net_ref(q, k, v, g, beta, state, *, repeat_type: int = 0):
    """Direct numpy port of ggml_compute_forward_delta_net_f32's scalar loop
    (the differential-test oracle)."""
    q, k, v = np.asarray(q, np.float64), np.asarray(k, np.float64), np.asarray(v, np.float64)
    g, beta = np.asarray(g, np.float64), np.asarray(beta, np.float64)
    b, t, hkq, d = q.shape
    h = v.shape[2]
    ratio = h // hkq
    S = np.asarray(state, np.float64).copy()      # (B,H,D,D)
    out = np.zeros((b, t, h, d))
    scale = 1.0 / np.sqrt(d)
    for bi in range(b):
        for hi in range(h):
            hkq_i = hi // ratio if repeat_type == 0 else hi % hkq
            for ti in range(t):
                q_t = q[bi, ti, hkq_i]
                k_t = k[bi, ti, hkq_i]
                v_t = v[bi, ti, hi]
                qn_inv = 1.0 / np.sqrt((q_t ** 2).sum() + EPS)
                kn_inv = 1.0 / np.sqrt((k_t ** 2).sum() + EPS)
                beta_v = 1.0 / (1.0 + np.exp(-beta[bi, ti, hi]))
                decay = np.exp(min(g[bi, ti, hi], 50.0))
                attn = float((k_t * kn_inv * q_t * qn_inv * scale).sum())
                v_prime = S[bi, hi] @ k_t
                out0 = S[bi, hi] @ q_t
                v_new = v_t * beta_v - v_prime * beta_v * decay * kn_inv
                out[bi, ti, hi] = out0 * decay * qn_inv * scale + v_new * attn
                kn = k_t * kn_inv
                S[bi, hi] = np.clip(decay * S[bi, hi] + np.outer(v_new, kn),
                                    -CLIP, CLIP)
    return out, S
