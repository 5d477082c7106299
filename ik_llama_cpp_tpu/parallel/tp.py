"""Tensor+data-parallel forward via shard_map.

Each device executes the per-shard forward (local attention heads, local FFN
slices) and synchronizes only at the reduction points — exactly the execution
model of the reference's async split-mode-graph executor
(ggml-backend.cpp:2208-2400: one thread per device, barriers at REDUCE
nodes), but expressed as XLA collectives over ICI.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import llama as llama_mod
from ..models.config import ModelConfig
from ..models.llama import KVCache
from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS, kv_spec, param_specs


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard view of the model: local head counts."""
    assert cfg.n_head % tp == 0, (cfg.n_head, tp)
    assert cfg.n_head_kv % tp == 0, (cfg.n_head_kv, tp)
    return dataclasses.replace(cfg, n_head=cfg.n_head // tp,
                               n_head_kv=cfg.n_head_kv // tp)


def make_tp_forward(cfg: ModelConfig, mesh: Mesh, params, *,
                    fwd=None, logits_last_only: bool = False):
    """Build a jitted (params, tokens, kv, n_past) -> (logits, kv) over the mesh.

    params are only used for their pytree structure (to derive in_specs).
    Meshes with an 'expert' axis additionally run whole-expert EP inside the
    MoE op (moe_ffn ep_axis)."""
    tp = mesh.shape[MODEL_AXIS]
    has_ep = EXPERT_AXIS in mesh.axis_names and mesh.shape[EXPERT_AXIS] > 1
    cfg_local = local_config(cfg, tp)
    pspecs = param_specs(params, ep=EXPERT_AXIS in mesh.axis_names)
    if fwd is None:
        fwd = llama_mod.forward
    import inspect
    fwd_kw = {}
    if "ep_axis" in inspect.signature(fwd).parameters:
        fwd_kw["ep_axis"] = EXPERT_AXIS if has_ep else None

    def per_shard(params, tokens, kv, n_past):
        return fwd(params, cfg_local, tokens, kv, n_past,
                   tp_axis=MODEL_AXIS,
                   logits_last_only=logits_last_only, **fwd_kw)

    # MLA absorb: the compressed latent cache has ONE shared head — it is
    # REPLICATED across the model axis (every shard computes identical rows
    # from the replicated wkv_a_mqa), matching the reference's
    # replicated_k_l per-device latent copies (llama-context.h:143)
    def _has_absorb(p):
        blocks = p.get("blocks") if isinstance(p, dict) else None
        return bool(blocks) and "wk_b" in blocks[0]

    if _has_absorb(params):
        rep = P(None, DATA_AXIS, None, None, None)
        cache_spec = KVCache(rep, rep)
    else:
        cache_spec = KVCache(kv_spec(), kv_spec())

    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(pspecs, P(DATA_AXIS, None), cache_spec, P()),
        out_specs=(P(DATA_AXIS, None, None), cache_spec),
        check_rep=False,
    )
    return jax.jit(sharded)
