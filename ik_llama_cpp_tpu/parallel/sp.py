"""Sequence (context) parallelism: long-prompt prefill sharded on the
TIME axis over a device ring.

The reference scales sequence length on one device (FA + quantized KV +
MLA + SWA, SURVEY §2.5); it has no way to throw N devices at ONE long
prompt. This module does: tokens are split into contiguous T/P chunks,
every device runs the full layer stack on its chunk (weights replicated),
and attention is ring attention (ops/ring_attention.py) — K/V chunks
rotate over ICI while flash-style running softmax accumulators keep the
score matrix tiled. Per-chip activation and attention memory fall as 1/P,
so a prompt P× longer fits at the same per-chip footprint.

After prefill the KV cache is a global array S-sharded over the ring;
decode continues anywhere — pass it to a single-chip (or TP) decode step
and XLA reshards/gathers automatically.

Composition with tensor parallel (a ('seq','model') 2-D mesh) is future
work; sp shines exactly where tp stops helping: the prefill of
100k+-token prompts, where attention — not the matmuls — owns the time.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental import mesh_utils
from jax.experimental.shard_map import shard_map

from ..models import llama as llama_mod
from ..models.config import ModelConfig
from ..models.llama import KVCache

SEQ_AXIS = "seq"


def make_seq_mesh(n: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n is not None:
        devices = devices[:n]
    arr = mesh_utils.create_device_mesh((len(devices),), devices=devices)
    return Mesh(arr, (SEQ_AXIS,))


def _replicated_specs(params):
    return jax.tree_util.tree_map(lambda _: P(), params)


def make_sp_prefill(cfg: ModelConfig, mesh: Mesh, params):
    """Build a jitted (params, tokens, kv, n_past) -> (logits, kv) where
    tokens (B, T) and the kv S-axis are sharded over the 'seq' ring.

    Constraints: n_past must be 0 (this is whole-prompt prefill), T must be
    a multiple of the ring size, and the cache capacity too (each shard
    owns capacity/P rows). Works for the standard causal graph incl. GQA,
    rope scaling, softcap, SWA and quantized KV writes; sinks/alibi raise.
    """
    sp = mesh.shape[SEQ_AXIS]

    def per_shard(params, tokens, kv, n_past):
        return llama_mod.forward(params, cfg, tokens, kv, n_past,
                                 sp_axis=SEQ_AXIS)

    kv_sp = P(None, None, SEQ_AXIS, None, None)
    sc_sp = P(None, None, SEQ_AXIS, None)
    pspecs = _replicated_specs(params)
    jits: dict[bool, object] = {}

    def _jitted(quantized: bool):
        if quantized not in jits:
            cache_spec = (KVCache(kv_sp, kv_sp, sc_sp, sc_sp) if quantized
                          else KVCache(kv_sp, kv_sp))
            sharded = shard_map(
                per_shard, mesh=mesh,
                in_specs=(pspecs, P(None, SEQ_AXIS), cache_spec, P()),
                out_specs=(P(None, SEQ_AXIS, None), cache_spec),
                check_rep=False,
            )
            jits[quantized] = jax.jit(sharded)
        return jits[quantized]

    def prefill(params, tokens, kv, n_past=0):
        t = tokens.shape[1]
        assert t % sp == 0, f"prompt length {t} not divisible by ring {sp}"
        assert kv.capacity % sp == 0, (kv.capacity, sp)
        assert kv.k_scale is None or kv.k.dtype == jnp.int8, \
            "q4-packed KV not supported under sequence parallel"
        if isinstance(n_past, (int, np.integer)):
            assert n_past == 0, "sp prefill starts from an empty cache"
        return _jitted(kv.k_scale is not None)(params, tokens, kv,
                                               jnp.int32(0))

    return prefill


def gather_cache(kv: KVCache, t: int, capacity: int, sp: int) -> KVCache:
    """Compact an sp-sharded cache into standard contiguous layout.

    After sp prefill each shard wrote its t/P rows at the HEAD of its own
    capacity/P slice, so globally the valid rows sit at stride capacity/P.
    Decode needs them contiguous from row 0. One gather, on whatever device
    the result should live."""
    per = t // sp
    cap_per = capacity // sp
    idx = (jnp.arange(t) // per) * cap_per + (jnp.arange(t) % per)

    def take(a):
        return None if a is None else \
            jnp.zeros_like(a).at[:, :, :t].set(jnp.take(a, idx, axis=2))

    return KVCache(take(kv.k), take(kv.v), take(kv.k_scale),
                   take(kv.v_scale))
