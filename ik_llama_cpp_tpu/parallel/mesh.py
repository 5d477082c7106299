"""Device mesh + weight sharding rules.

The TPU-native replacement for the reference's split-mode-graph tensor
parallelism (prepare_split_tensors, llama-load-tensors.cpp:4393-4545 and
ggml_reduce + NCCL): one named mesh (data, model[, expert]), weights
annotated per the same split rules the reference uses —
  * attn q/k/v and ffn up/gate: split output dim (columns) over 'model'
  * attn output and ffn down: split input dim (rows) over 'model'
  * norms / embeddings: replicated
  * KV cache: kv-heads over 'model', batch over 'data'
— with the all-reduce the reference does explicitly (GGML_OP_REDUCE ->
ncclAllReduce, reduce.cu:164) expressed as jax.lax.psum inside shard_map.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.weights import QLinear, QLinearI4, QLinearI8, DenseLinear
from ..ops.moe import ExpertWeights, QuantExpertWeights

DATA_AXIS = "data"
MODEL_AXIS = "model"
EXPERT_AXIS = "expert"


def make_mesh(shape: tuple[int, ...] | None = None, devices=None) -> Mesh:
    """Create a (data, model) or (data, expert, model) mesh.

    Default: all devices on the model axis. A 3-tuple (dp, ep, tp) adds the
    expert axis — whole-expert sharding, the EP extension the reference lacks
    (its -sm graph only splits intra-expert; llama-load-tensors.cpp:5356)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    names = (DATA_AXIS, MODEL_AXIS) if len(shape) == 2 else \
        (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS)
    assert int(np.prod(shape)) == n, (shape, n)
    arr = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(arr, names)


def _linear_spec(kind: str):
    """PartitionSpecs for a linear's (codes/scale/bias or dense w) leaves.

    kind: 'col' (output-dim sharded), 'row' (input-dim sharded), 'rep'.
    All leaves of a linear share K-leading layout: codes (K, N),
    scale/bias (K//G, N), dense w (K, N).
    """
    if kind == "col":
        return P(None, MODEL_AXIS)
    if kind == "row":
        return P(MODEL_AXIS, None)
    return P(None, None)


# which block weights get which split (mirrors llama-load-tensors.cpp:4507-4545)
_BLOCK_KINDS = {
    "wq": "col", "wk": "col", "wv": "col", "wqkv": "col", "wo": "row",
    "ffn_gate": "col", "ffn_up": "col", "ffn_down": "row",
    "ffn_gate_shexp": "col", "ffn_up_shexp": "col", "ffn_down_shexp": "row",
    "ffn_gate_inp": "rep", "ffn_gate_inp_shexp": "rep",
    "attn_norm": "rep", "ffn_norm": "rep",
    "attn_post_norm": "rep", "ffn_post_norm": "rep",
    "attn_q_norm": "rep", "attn_k_norm": "rep",
    "attn_q_bias": "colv", "attn_k_bias": "colv", "attn_v_bias": "colv",
    # deepseek2 MLA (llama-load-tensors.cpp:4459-4545 split rules):
    # per-head wq_b/wkv_b columns on 'model', wo rows; the latent path
    # (wq_a, wkv_a_mqa, norms) is replicated like replicated_k_l
    "wq_a": "rep", "wq_b": "col", "wkv_a_mqa": "rep", "wkv_b": "col",
    "q_a_norm": "rep", "kv_a_norm": "rep", "exp_probs_b": "rep",
}


def _spec_for_leaf_path(path: str, leaf) -> P:
    parts = path.split(".")
    name = parts[-1]
    if name in ("wk_b", "wv_b"):
        # MLA absorb projections (h, d_nope, lora_kv) / (h, lora_kv, dv):
        # head axis on 'model' with a replicated latent cache — the
        # reference's distribute_mla_tensors_for_split_mode_graph
        # (llama-load-tensors.cpp:4479; replicated_k_l llama-context.h:143)
        return P(MODEL_AXIS, None, None)
    if name in ("tok_embd", "output_norm", "cvec"):
        return P(None) if getattr(leaf, "ndim", 2) == 1 else P(None, None)
    kind = _BLOCK_KINDS.get(name)
    if name == "output":
        kind = "col"  # vocab-sharded head; logits all-gathered
    if kind is None:
        return P()
    if kind == "rep":
        if isinstance(leaf, (QLinear, QLinearI4, QLinearI8, DenseLinear)):
            return P(None, None)
        return P(None)
    if kind == "colv":  # 1-D bias sharded on its only dim
        return P(MODEL_AXIS)
    return _linear_spec(kind)


def _expert_specs(ep: bool):
    """Specs for stacked ExpertWeights (n_expert, K, N):
    FF dim on 'model' (intra-expert split, llama-load-tensors.cpp:5356-5368)
    and, with ep, the expert dim on 'expert' (whole-expert EP extension)."""
    e_ax = EXPERT_AXIS if ep else None
    return ExpertWeights(
        gate=P(e_ax, None, MODEL_AXIS),
        up=P(e_ax, None, MODEL_AXIS),
        down=P(e_ax, MODEL_AXIS, None),
    )


def _quant_expert_specs(ew: "QuantExpertWeights", ep: bool):
    """Specs for planar-quantized experts: codes (n_expert, K, N) + scales
    (n_expert, K//G, N) follow the same megatron split (up/gate columns on
    'model', down rows on 'model'). Row-splitting the down scales requires
    FF % (group * tp) == 0 — true for every production MoE (FF_exp is a
    multiple of 256); tiny fixtures fall back to bf16 experts before TP."""
    e_ax = EXPERT_AXIS if ep else None
    return QuantExpertWeights(
        gate=P(e_ax, None, MODEL_AXIS), gate_s=P(e_ax, None, MODEL_AXIS),
        up=P(e_ax, None, MODEL_AXIS), up_s=P(e_ax, None, MODEL_AXIS),
        down=P(e_ax, MODEL_AXIS, None), down_s=P(e_ax, MODEL_AXIS, None),
        gate_group=ew.gate_group, up_group=ew.up_group,
        down_group=ew.down_group,
        gate_b=None if ew.gate_b is None else P(e_ax, MODEL_AXIS),
        up_b=None if ew.up_b is None else P(e_ax, MODEL_AXIS),
        down_b=None if ew.down_b is None else P(e_ax, None),
    )


def param_specs(params: Any, *, ep: bool = False) -> Any:
    """Build a pytree of PartitionSpecs parallel to a llama params pytree."""

    def visit(obj, path):
        if isinstance(obj, dict):
            return {k: visit(v, f"{path}.{k}" if path else k) for k, v in obj.items()}
        if isinstance(obj, list):
            return [visit(v, path) for v in obj]
        if isinstance(obj, ExpertWeights):
            return _expert_specs(ep)
        if isinstance(obj, QuantExpertWeights):
            return _quant_expert_specs(obj, ep)
        if isinstance(obj, QLinear):
            spec = _spec_for_leaf_path(path, obj)
            bias_spec = None if obj.bias is None else (
                P(spec[0], spec[1]) if len(spec) == 2 else spec)
            return QLinear(spec, P(spec[0], spec[1]) if len(spec) == 2 else spec,
                           bias_spec, group=obj.group)
        if isinstance(obj, QLinearI8):
            # same layout family as QLinear: codes (K, N), sw (K/256, N),
            # gbias (K/G, N) — scale rows shard with the code rows
            spec = _spec_for_leaf_path(path, obj)
            s2 = P(spec[0], spec[1]) if len(spec) == 2 else spec
            return QLinearI8(spec, s2,
                             None if obj.gbias is None else s2,
                             group=obj.group)
        if isinstance(obj, QLinearI4):
            spec = _spec_for_leaf_path(path, obj)
            bias_spec = None if obj.bias is None else (
                P(spec[0], spec[1]) if len(spec) == 2 else spec)
            return QLinearI4(spec,
                             P(spec[0], spec[1]) if len(spec) == 2 else spec,
                             bias_spec, group=obj.group, lut16=obj.lut16)
        if isinstance(obj, DenseLinear):
            return DenseLinear(_spec_for_leaf_path(path, obj))
        # plain array (norm weights, biases, embedding table)
        return _spec_for_leaf_path(path, obj)

    return visit(params, "")


def _pad_axis(x, axis: int, mult: int):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pad_output_head(params: Any, tp: int) -> Any:
    """Pad the vocab-sharded lm head's output dim to a multiple of tp
    (Megatron-style vocab padding); forward slices logits back to n_vocab."""
    if "output" not in params:   # non-final pipeline stage (pp × tp)
        return params
    out = params["output"]
    if isinstance(out, QLinear):
        params = dict(params)
        params["output"] = QLinear(
            _pad_axis(out.codes, 1, tp), _pad_axis(out.scale, 1, tp),
            None if out.bias is None else _pad_axis(out.bias, 1, tp),
            group=out.group)
    elif isinstance(out, QLinearI8):
        params = dict(params)
        params["output"] = QLinearI8(
            _pad_axis(out.codes, 1, tp), _pad_axis(out.sw, 1, tp),
            None if out.gbias is None else _pad_axis(out.gbias, 1, tp),
            group=out.group)
    elif isinstance(out, QLinearI4):
        params = dict(params)
        params["output"] = QLinearI4(
            _pad_axis(out.packed, 1, tp), _pad_axis(out.scale, 1, tp),
            None if out.bias is None else _pad_axis(out.bias, 1, tp),
            group=out.group, lut16=out.lut16)
    elif isinstance(out, DenseLinear):
        params = dict(params)
        params["output"] = DenseLinear(_pad_axis(out.w, 1, tp))
    return params


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its NamedSharding (pads the lm head)."""
    params = pad_output_head(params, mesh.shape[MODEL_AXIS])
    specs = param_specs(params, ep=EXPERT_AXIS in mesh.axis_names)

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, params, specs,
        is_leaf=lambda x: x is None)


def kv_spec() -> P:
    """KV cache (L, B, S, Hkv, D): batch on data, kv-heads on model."""
    return P(None, DATA_AXIS, None, MODEL_AXIS, None)
