"""K-shift context shifting — the TPU analogue of the reference's
build_k_shift graph (llama-build-context.cpp:153) + llama_kv_cache_seq_add:
instead of re-prefilling after the context fills up, the kept cache rows
are MOVED down and the moved rows' roped dims re-rotated by the position
delta.

NEOX/NORM rope is a pure per-pair rotation, so it composes:
rope(x, pos + d) == rope(rope(x, pos), d) — one extra rotation by the
negative discard count re-bases cached keys exactly (the same identity
the reference relies on: ggml_rope over the K cache with inp_K_shift
deltas).

Shiftability mirrors llama_kv_cache get_can_shift: standard roped
attention only — MLA latent caches, NoPE/chunked-attention layers, ALiBi
and recurrent models fall back to the engine's re-prefill path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.llama import KVCache
from ..ops import layers as L


def can_shift(cfg: ModelConfig) -> bool:
    """get_can_shift analogue (llama.cpp): roped non-MLA dense caches."""
    return (cfg.use_rope and cfg.n_lora_kv == 0 and cfg.alibi_max_bias == 0
            and cfg.attn_chunk == 0 and not cfg.nope_layer_mask
            and not cfg.no_rope_step
            # -khad stores K Hadamard-ROTATED: rope is not a per-pair
            # rotation in that basis, so shift falls back to re-prefill
            and not cfg.k_hadamard
            and not (cfg.extra or {}).get("rope_sections")
            and not (cfg.extra or {}).get("rope_dim_arr")
            and cfg.arch not in ("mamba", "qwen3next", "qwen35", "qwen35moe",
                                 "gemma4", "openpangu", "t5", "t5encoder"))


@functools.partial(jax.jit, static_argnames=("cfg", "n_keep", "n_discard",
                                             "layer_offset"))
def k_shift(kv: KVCache, cfg: ModelConfig, n_keep: int, n_discard: int,
            n_past, layer_offset: int = 0):
    """Discard rows [n_keep, n_keep + n_discard); move the tail down and
    re-rotate the MOVED rows' roped dims by -n_discard (kept head rows
    stay untouched). Returns (kv, new_n_past).

    kv.k: (L, B, S, Hkv, D) with RoPE'd keys (packed codecs store width
    != D; rope math always runs on the dequantized head_dim)."""
    d = cfg.head_dim if kv.quantized else kv.k.shape[-1]
    rope_dims = cfg.rope_dim or cfg.head_dim
    tail_len = kv.k.shape[2] - (n_keep + n_discard)
    delta = jnp.full((1, tail_len), -n_discard, jnp.int32)
    cos, sin = L.rope_cache(delta, rope_dims, cfg.rope_freq_base)
    if cfg.rope_freq_base_swa > 0 and cfg.swa_layer_mask:
        cos_swa, sin_swa = L.rope_cache(delta, rope_dims,
                                        cfg.rope_freq_base_swa)
    else:
        cos_swa, sin_swa = cos, sin

    def rotate(tail, c, s):
        # tail (B, T, Hkv, D) f32
        if rope_dims >= d:
            return L.apply_rope(tail, c, s, cfg.rope_type)
        rot = L.apply_rope(tail[..., :rope_dims], c, s, cfg.rope_type)
        return jnp.concatenate([rot, tail[..., rope_dims:]], axis=-1)

    def move(arr, rotated_tail):
        head = arr[:, :n_keep]
        junk = arr[:, :n_discard]            # filler; masked by n_past
        return jnp.concatenate([head, rotated_tail, junk], axis=1)

    new_k, new_ks = [], []
    for i in range(kv.k.shape[0]):
        # layer_offset: kv may be one -sm layer stage's slice; per-layer
        # config lookups (SWA rope base) need the absolute index
        is_swa = cfg.layer_is_swa(i + layer_offset)
        c, s = (cos_swa, sin_swa) if is_swa else (cos, sin)
        tail = kv.k[i][:, n_keep + n_discard:]
        if kv.quantized:
            from ..ops.kv_quant import (KV_ENCODERS, KV_DECODERS,
                                        kv_codec_of)
            codec = kv_codec_of(kv.k[i], d)
            ts = kv.k_scale[i][:, n_keep + n_discard:]
            tf = KV_DECODERS[codec](tail, ts)
            tq, tqs = KV_ENCODERS[codec](rotate(tf, c, s))
            new_k.append(move(kv.k[i], tq))
            new_ks.append(move(kv.k_scale[i], tqs))
        else:
            rot = rotate(tail.astype(jnp.float32), c, s).astype(kv.k.dtype)
            new_k.append(move(kv.k[i], rot))

    k_all = jnp.stack(new_k)
    v_all = jnp.stack([move(kv.v[i], kv.v[i][:, n_keep + n_discard:])
                       for i in range(kv.v.shape[0])])
    if kv.quantized:
        ks_all = jnp.stack(new_ks)
        vs_all = jnp.stack(
            [move(kv.v_scale[i], kv.v_scale[i][:, n_keep + n_discard:])
             for i in range(kv.v_scale.shape[0])])
        out = KVCache(k_all, v_all, ks_all, vs_all)
    else:
        out = KVCache(k_all, v_all)
    return out, n_past - n_discard
