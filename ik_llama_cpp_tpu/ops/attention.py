"""Attention ops.

Round-1 implementation: jnp masked attention over a fixed-capacity KV cache
(XLA fuses this well on TPU for moderate S); the Pallas flash-attention
kernel with quantized KV replaces the inner computation behind the same
interface. Mirrors the reference semantics of llm_build_kqv
(llama-build-context.cpp:2011-2135): f32 softmax, optional softcap, GQA,
causal masking against cache fill level.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def alibi_slopes(n_head: int, max_bias: float):
    """Per-head ALiBi slopes, matching ggml_compute_forward_soft_max_f32
    (ggml.c: m0 = 2^(-max_bias/n_head_log2), m1 = 2^(-max_bias/2/n_head_log2),
    slope(h) = m0^(h+1) for h < n_head_log2 else m1^(2(h-n_head_log2)+1))."""
    import numpy as np
    n_head_log2 = 1 << int(np.floor(np.log2(n_head)))
    m0 = 2.0 ** (-max_bias / n_head_log2)
    m1 = 2.0 ** (-max_bias / 2.0 / n_head_log2)
    return np.asarray([
        m0 ** (h + 1) if h < n_head_log2 else m1 ** (2 * (h - n_head_log2) + 1)
        for h in range(n_head)], np.float32)


def attend(q, k, v, *, q_pos, kv_len, scale, softcap: float = 0.0,
           swa_window: int = 0, sinks=None, alibi=None, attn_chunk: int = 0,
           allow_mask=None, key_positions=None):
    """Masked attention over a fixed-size KV buffer.

    q: (B, T, H, Dk); k: (B, S, Hkv, Dk); v: (B, S, Hkv, Dv) — S is capacity.
    q_pos: (B, T) absolute positions of the queries.
    kv_len: (B,) number of valid cache entries (= n_past + T).
    alibi: optional (H,) per-head slopes; adds slope * -|kpos - qpos| to the
    scores (the reference fills the KQ mask with -|cell_pos - pos| when
    hparams.use_alibi, llama.cpp:5330, and soft_max_ext scales it per head).
    Returns (B, T, H, D) in q.dtype.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    hkv = k.shape[2]
    rep = h // hkv

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if rep > 1:
        kf = jnp.repeat(kf, rep, axis=2)
        vf = jnp.repeat(vf, rep, axis=2)

    # scores: (B, H, T, S)
    scores = jnp.einsum("bthd,bshd->bhts", qf, kf) * scale
    if softcap > 0.0:
        scores = softcap * jnp.tanh(scores / softcap)

    if key_positions is not None:
        # ring/compacted caches (--swa-compress): the slot index is not the
        # absolute position; callers pass per-slot positions (B, S) with -1
        # marking unwritten slots
        key_pos = key_positions[:, None, :]                          # (B,1,S)
        qp = q_pos[:, :, None]
        mask = (key_pos <= qp) & (key_pos >= 0)
    else:
        key_pos = jnp.arange(s, dtype=jnp.int32)[None, None, :]      # (1,1,S)
        qp = q_pos[:, :, None]                                       # (B,T,1)
        mask = (key_pos <= qp) & (key_pos < kv_len[:, None, None])
    if swa_window > 0:
        mask &= key_pos > qp - swa_window
    if attn_chunk > 0:
        # llama4 chunked attention: keys within the query's chunk only
        # (llama.cpp:5334 pos_chunk_start)
        mask &= key_pos >= (qp // attn_chunk) * attn_chunk
    if allow_mask is not None:
        # DSA sparse attention: per-(query, key) top-k allow set from the
        # lightning indexer (build_deepseek2_dsa_sparse_mask)
        mask &= allow_mask
    if alibi is not None:
        dist = jnp.abs(key_pos - qp).astype(jnp.float32)             # (B,T,S)
        scores = scores - (jnp.asarray(alibi, jnp.float32)[None, :, None, None]
                           * dist[:, None, :, :])
    scores = jnp.where(mask[:, None, :, :], scores, jnp.float32(-1e30))

    if sinks is not None:
        # attention sinks (gpt-oss style): extra per-head logit that absorbs mass
        sink = sinks.astype(jnp.float32).reshape(1, h, 1, 1)
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sink)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True) + jnp.exp(sink - m)
        probs = e / denom
    else:
        probs = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum("bhts,bshd->bthd", probs, vf)
    return out.astype(q.dtype)
