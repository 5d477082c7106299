"""Ring attention: causal attention with the sequence sharded over a mesh
axis — context parallelism for long-prompt prefill.

Each device holds a contiguous T/P-token chunk of Q, K and V. K/V chunks
rotate around the ring via `lax.ppermute` while every device keeps a
running flash-attention-style (max, sum, accumulator) triple for its local
queries, so no device ever materializes more than one remote chunk and the
full T×T score matrix never exists anywhere. This is the TPU-native
scaling move for sequence length the reference does not have (its CPU/CUDA
FA kernels are single-device; seq scaling there is only via KV quant /
MLA / SWA — SURVEY §2.5): attention memory per chip falls as 1/P and the
rotation rides ICI neighbor links.

The chunk schedule is the plain causal ring (device i needs chunks
0..i), so late devices do more useful work than early ones — the classic
~2x bubble. A load-balanced (zigzag) schedule is a future optimization;
correctness and memory scaling do not depend on it.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def ring_attend(q, k, v, axis: str, *, scale: float, softcap: float = 0.0,
                swa_window: int = 0):
    """Causal self-attention over a sequence sharded on mesh axis ``axis``.

    q: (B, Tl, H, D) — local query chunk (bf16/f32)
    k, v: (B, Tl, Hkv, D) — local key/value chunk (same T-sharding)
    Positions are chunk-relative (shard index × Tl + offset); the causal and
    sliding-window masks are shift-invariant, so the caller's n_past base
    cancels (rope uses absolute positions, applied before this op).
    Returns (B, Tl, H, D) f32 attention output for the local queries.

    Must be called inside shard_map over a mesh with ``axis``.
    """
    P = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    b, tl, h, d = q.shape
    hkv = k.shape[2]
    assert h % hkv == 0, (h, hkv)
    g = h // hkv

    qf = q.astype(jnp.float32) * scale
    qpos = idx * tl + jnp.arange(tl, dtype=jnp.int32)          # (Tl,)

    o = jnp.zeros((b, tl, h, d), jnp.float32)
    m = jnp.full((b, tl, h), _NEG, jnp.float32)
    l = jnp.zeros((b, tl, h), jnp.float32)

    k_blk, v_blk = k, v
    src = idx                                   # origin of the held chunk
    perm = [(i, (i + 1) % P) for i in range(P)]
    for _ in range(P):
        kpos = src * tl + jnp.arange(tl, dtype=jnp.int32)       # (Tl,)
        # (B, Tl_q, Hkv, G, Tl_k)
        s = jnp.einsum("bqhgd,bkhd->bqhgk",
                       qf.reshape(b, tl, hkv, g, d),
                       k_blk.astype(jnp.float32))
        if softcap > 0:
            s = jnp.tanh(s / softcap) * softcap
        mask = kpos[None, :] <= qpos[:, None]                   # (Tl_q, Tl_k)
        if swa_window > 0:
            lo = qpos[:, None] - (swa_window - 1)
            mask = mask & (kpos[None, :] >= lo)
        s = jnp.where(mask[None, :, None, None, :], s, _NEG)
        s = s.reshape(b, tl, h, tl)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.where(mask[None, :, None, :],
                      jnp.exp(s - m_new[..., None]), 0.0)
        corr = jnp.exp(m - m_new)
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bqhgk,bkhd->bqhgd", p.reshape(b, tl, hkv, g, tl),
            v_blk.astype(jnp.float32)).reshape(b, tl, h, d)
        m = m_new
        k_blk = lax.ppermute(k_blk, axis, perm)
        v_blk = lax.ppermute(v_blk, axis, perm)
        src = (src - 1) % P
    return o / l[..., None]
