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
    return (y * weight.astype(jnp.float32)).astype(dt)


def layer_norm(x, weight, bias=None, eps: float = 1e-5):
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


def rope_cache(positions, head_dim: int, freq_base: float = 10000.0,
               freq_scale: float = 1.0, dtype=jnp.float32):
    """Precompute cos/sin tables: positions (...,) -> (..., head_dim // 2)."""
    half = head_dim // 2
    inv_freq = freq_scale / (freq_base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., half)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x, cos, sin, rope_type: int = ROPE_TYPE_NEOX):
    """x: (..., T, H, D); cos/sin: (..., T, D//2) broadcast over heads."""
    d = x.shape[-1]
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


def softcap(x, cap: float):
    """ggml SOFTCAP: cap * tanh(x / cap)."""
    return cap * jnp.tanh(x / cap)
