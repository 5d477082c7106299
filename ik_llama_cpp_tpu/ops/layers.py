"""Elementwise / normalization / rotary ops (jnp; XLA fuses these).

Numerics mirror the reference graph builders:
  * RMS norm in f32 (llm_build_norm, llama-build-context.cpp; ggml fused
    FUSED_RMS_NORM): y = x * rsqrt(mean(x^2) + eps) * w
  * RoPE NORM mode rotates consecutive pairs, NEOX mode rotates halves
    (ggml_rope / ggml_compute_forward_rope; rope type per arch as in
    llama_rope_type, src/llama.cpp)
  * SwiGLU ffn: down(silu(gate) * up) (llm_build_ffn)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ROPE_TYPE_NORM = 0   # consecutive pairs (original llama GGUF convention)
ROPE_TYPE_NEOX = 2   # rotate halves


def rms_norm(x, weight, eps: float = 1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if weight is None:
        return y.astype(dt)
    return (y * weight.astype(jnp.float32)).astype(dt)


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:   # olmo: non-parametric LN (build_olmo.cpp NULL w)
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


def rope_cache(positions, head_dim: int, freq_base: float = 10000.0,
               freq_scale: float = 1.0, dtype=jnp.float32, *,
               ext_factor: float = 0.0, attn_factor: float = 1.0,
               beta_fast: float = 32.0, beta_slow: float = 1.0,
               n_ctx_orig: int = 0):
    """Precompute cos/sin tables: positions (...,) -> (..., head_dim // 2).

    Implements ggml's rope_yarn correction (ggml rope_yarn/rope_yarn_ramp):
    with ext_factor == 0 this reduces to plain scaled rope.
    """
    import math
    half = head_dim // 2
    dims = jnp.arange(0, half, dtype=jnp.float32)
    theta_extrap = positions.astype(jnp.float32)[..., None] / (
        freq_base ** (dims / half))
    mscale = attn_factor
    if ext_factor != 0.0 and n_ctx_orig > 0:
        def corr_dim(n_rot_beta):
            return half * 2 * math.log(n_ctx_orig / (n_rot_beta * 2 * math.pi)) / (
                2 * math.log(freq_base))
        low = max(0.0, math.floor(corr_dim(beta_fast)))
        high = min(head_dim - 1.0, math.ceil(corr_dim(beta_slow)))
        i0 = 2.0 * dims
        ramp = 1.0 - jnp.clip((i0 / 2.0 - low) / max(0.001, high - low), 0.0, 1.0)
        ramp_mix = ramp * ext_factor
        theta_interp = freq_scale * theta_extrap
        theta = theta_interp * (1 - ramp_mix) + theta_extrap * ramp_mix
        mscale = attn_factor * (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        theta = freq_scale * theta_extrap
    return (jnp.cos(theta) * mscale).astype(dtype), (jnp.sin(theta) * mscale).astype(dtype)


def imrope_text_mask(sections, n_rot: int):
    """Per-dim-pair rotation mask for interleaved mrope on TEXT tokens.

    ggml_mrope_cache_init (ggml.c:20777-20786) assigns each dim pair
    (sector = pair % sum(sections)) round-robin to the t/h/w streams, with
    unmatched sectors falling to the "extra" stream. For text batches the
    reference feeds positions [t, t, t, 0] (llama.cpp:6238-6257), so t/h/w
    pairs rotate by the token position and extra pairs do not rotate at all.
    Returns a bool (n_rot//2,) numpy mask: True = rotate by position."""
    import numpy as _np
    s = list(sections) + [0] * (4 - len(sections))
    sect_dims = s[0] + s[1] + s[2] + s[3]
    half = n_rot // 2
    mask = _np.zeros(half, dtype=bool)
    for j in range(half):
        sector = j % max(sect_dims, 1)
        if sector % 3 == 1 and sector < 3 * s[1]:
            mask[j] = True      # theta_h = t for text
        elif sector % 3 == 2 and sector < 3 * s[2]:
            mask[j] = True      # theta_w = t for text
        elif sector % 3 == 0 and sector < 3 * s[0]:
            mask[j] = True      # theta_t
        # else: extra stream, position 0 -> no rotation
    return mask


def apply_rope(x, cos, sin, rope_type: int = ROPE_TYPE_NEOX):
    """x: (..., T, H, D); cos/sin: (..., T, R//2) broadcast over heads.

    When R < D only the first R dims are rotated (partial rotary, e.g.
    phi3's n_rot < head_dim; ggml_rope_ext semantics)."""
    d = x.shape[-1]
    rot = cos.shape[-1] * 2
    if rot < d:
        xr, xpass = x[..., :rot], x[..., rot:]
        return jnp.concatenate(
            [apply_rope(xr, cos, sin, rope_type), xpass], axis=-1)
    half = d // 2
    xf = x.astype(jnp.float32)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    if rope_type == ROPE_TYPE_NEOX:
        x1, x2 = xf[..., :half], xf[..., half:]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.concatenate([o1, o2], axis=-1)
    else:  # NORM: consecutive pairs (x0,x1), (x2,x3), ...
        x1 = xf[..., 0::2]
        x2 = xf[..., 1::2]
        o1 = x1 * c - x2 * s
        o2 = x2 * c + x1 * s
        out = jnp.stack([o1, o2], axis=-1).reshape(xf.shape)
    return out.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def swiglu(gate, up):
    return silu(gate.astype(jnp.float32)).astype(gate.dtype) * up


def gelu(x):
    return jax.nn.gelu(x, approximate=True)


def glu(gate, up, act: str = "silu", limit: float = 0.0):
    """Gated FFN activation: act(gate) * up. act per llm_build_ffn's
    LLM_FFN_SILU / LLM_FFN_GELU(+PAR) / LLM_FFN_RELU_SQR variants.

    ``limit`` > 0 clamps per step35/deepseek4 swiglu_limits
    (ggml_compute_forward_fused_mul_unary, ggml.c:16966-16976):
    min(silu(g), limit) * clamp(u, -limit, limit)."""
    if limit > 0.0 and act == "silu":
        gf = gate.astype(jnp.float32)
        uf = up.astype(jnp.float32)
        g = jnp.minimum(silu(gf), limit)
        return (g * jnp.clip(uf, -limit, limit)).astype(up.dtype)
    gf = gate.astype(jnp.float32)
    if act == "gelu":
        a = jax.nn.gelu(gf, approximate=True)
    elif act == "relu2":
        a = jnp.square(jax.nn.relu(gf))
    elif act == "swiglu_oai":
        # ggml_swiglu_oai (alpha=1.702, limit=7): clamped gate/up variant
        g = jnp.minimum(gf, 7.0)
        u = jnp.clip(up.astype(jnp.float32), -7.0, 7.0)
        return (g * jax.nn.sigmoid(1.702 * g) * (u + 1.0)).astype(gate.dtype)
    else:
        a = gf * jax.nn.sigmoid(gf)
    return a.astype(gate.dtype) * up


def softcap(x, cap: float):
    """ggml SOFTCAP: cap * tanh(x / cap)."""
    return cap * jnp.tanh(x / cap)
