"""Quantized KV cache ops — the analogue of the reference's -ctk/-ctv q8_0 /
Q8_KV cache types (quantize-on-write into cache views, llm_build_kv_store,
llama-build-context.cpp:906-960).

Cache layout: int8 values (L, B, S, H, D) + f32 scales (L, B, S, H), one
scale per (token, head) row — the Q8_KV-style per-row codec
(iqk_quantize.h:288-292), which measured best for KV in the reference.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv_rows(x):
    """x: (B, T, H, D) float -> (int8 values, f32 scales (B, T, H))."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv(q, scale):
    """q: (..., D) int8, scale: (...,) -> float32."""
    return q.astype(jnp.float32) * scale[..., None]
