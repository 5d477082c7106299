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


# ---------------------------------------------------------------------------
# 4-bit KV codec — the -ctk/-ctv q4_0 analogue, halving KV memory again.
# Codes are packed two-per-byte with the LOW nibble holding dims [0, D/2)
# and the HIGH nibble dims [D/2, D): kernels can then unpack with two
# half-width dots (no lane interleave), the same split-halves trick as the
# int4 weight kernel (ops/qmatmul.qmatmul4).
# ---------------------------------------------------------------------------

def quantize_kv_rows_q4(x):
    """x: (B, T, H, D) float -> (uint8 packed (B, T, H, D//2),
    f32 scales (B, T, H)). Per-(token, head) absmax over the row."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 7.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -8, 7).astype(jnp.int32) + 8
    lo, hi = q[..., :d // 2], q[..., d // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def dequantize_kv_q4(packed, scale):
    """packed: (..., D//2) uint8, scale: (...,) -> float32 (..., D)."""
    p = packed.astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    return (jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
            * scale[..., None])


# ---------------------------------------------------------------------------
# 6-bit KV codec — the -ctk/-ctv q6_0 analogue (the reference's preferred
# "nearly-q8 quality at 0.75 bytes" cache type, iqk_flash_attn.cpp:121-149).
# The reference packs 6-bit codes inside 32-element blocks; a TPU-native
# layout must keep full lane density, so the code is split BIT-WISE into two
# planes stored in ONE uint8 row of width 3D/4:
#   * bytes [0, D/2): the LOW 4 bits, packed exactly like the q4 codec
#     (low nibble = dims [0, D/2), high nibble = dims [D/2, D))
#   * bytes [D/2, 3D/4): the HIGH 2 bits, four dims per byte: byte j holds
#     dims j, j+D/4, j+D/2, j+3D/4 at bit pairs 0, 2, 4, 6
# code = (hi2 << 4 | lo4) - 32 in [-31, 31]; per-(token, head) absmax scale.
# Unpacking is all full-width shifts/masks on the VPU — no lane gathers —
# and the single-array layout reuses every q4 cache/kernel plumbing path
# (codecs are told apart by the stored width: D/2 = q4, 3D/4 = q6).
# ---------------------------------------------------------------------------

def quantize_kv_rows_q6(x):
    """x: (B, T, H, D) float -> (uint8 packed (B, T, H, 3*D//4),
    f32 scales (B, T, H)). D % 4 == 0."""
    xf = x.astype(jnp.float32)
    d = xf.shape[-1]
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 31.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale > 0, scale, 1.0), 0.0)
    q = jnp.clip(jnp.round(xf * inv[..., None]), -31, 31
                 ).astype(jnp.int32) + 32                 # [1, 63]
    lo = q & 0x0F
    hi = q >> 4                                           # [0, 3]
    plane4 = lo[..., :d // 2] | (lo[..., d // 2:] << 4)
    q4 = d // 4
    plane2 = (hi[..., 0 * q4:1 * q4]
              | (hi[..., 1 * q4:2 * q4] << 2)
              | (hi[..., 2 * q4:3 * q4] << 4)
              | (hi[..., 3 * q4:4 * q4] << 6))
    return jnp.concatenate([plane4, plane2], axis=-1).astype(jnp.uint8), scale


def unpack_kv_q6(packed):
    """(..., 3*D//4) uint8 -> int32 codes (..., D) in [-31, 31]."""
    w = packed.shape[-1]
    d = (w * 4) // 3
    p4 = packed[..., :d // 2].astype(jnp.int32)
    p2 = packed[..., d // 2:].astype(jnp.int32)
    lo = jnp.concatenate([p4 & 0x0F, p4 >> 4], axis=-1)           # (..., D)
    hi = jnp.concatenate([(p2 >> s) & 3 for s in (0, 2, 4, 6)], axis=-1)
    return (hi << 4 | lo) - 32


def dequantize_kv_q6(packed, scale):
    """Inverse of quantize_kv_rows_q6 -> float32 (..., D)."""
    return unpack_kv_q6(packed).astype(jnp.float32) * scale[..., None]
