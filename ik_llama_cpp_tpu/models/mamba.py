"""Mamba (selective SSM) model family — TPU-native analogue of
src/graphs/build_mamba.cpp + ggml's SSM_CONV / SSM_SCAN ops
(ggml.c ggml_compute_forward_ssm_scan_f32).

Design: the depthwise causal conv runs as a static unrolled
shift-multiply-add over the (small, static) kernel width; the selective scan
is a `lax.scan` over time carrying the (B, d_inner, d_state) recurrent state.
The recurrence math matches the reference exactly:
  dt' = softplus(dt);  state = state * exp(dt' * A) + B_t * (x * dt')
  y   = state . C_t;   y = (y + x * D) * silu(z)
State lives in a MambaCache (conv tail + ssm state per layer) — the analogue
of the reference storing recurrent states in repurposed KV-cache tensors
(k_l = conv states, v_l = ssm states).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from .config import ModelConfig
from .weights import dequant_tensor, load_dense, load_linear


@jax.tree_util.register_pytree_node_class
@dataclass
class MambaCache:
    """Recurrent state: conv tail (L, B, d_conv-1, d_inner) and ssm state
    (L, B, d_inner, d_state)."""

    conv: Any
    ssm: Any

    def tree_flatten(self):
        return (self.conv, self.ssm), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int = 0, **_):
        d_inner = cfg.ssm_d_inner
        return cls(
            jnp.zeros((cfg.n_layer, batch, cfg.ssm_d_conv - 1, d_inner),
                      jnp.float32),
            jnp.zeros((cfg.n_layer, batch, d_inner, cfg.ssm_d_state),
                      jnp.float32),
        )

    @property
    def capacity(self):
        return 1 << 30      # recurrent state never fills


def load_mamba_params(gg: GGUFModel, cfg: ModelConfig, *, use_quant: bool = True):
    t = gg.tensors
    params: dict[str, Any] = {}
    params["tok_embd"] = jnp.asarray(
        np.ascontiguousarray(dequant_tensor(t["token_embd.weight"])),
        dtype=jnp.bfloat16)
    params["output_norm"] = load_dense(t["output_norm.weight"])
    out_name = "output.weight" if "output.weight" in t else "token_embd.weight"
    params["output"] = load_linear(t[out_name], use_quant=use_quant)

    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            "ssm_in": load_linear(t[p + "ssm_in.weight"], use_quant=use_quant),
            # depthwise conv kernel, logical (d_inner, 1, d_conv) -> (d_inner, d_conv)
            "conv1d": jnp.asarray(
                dequant_tensor(t[p + "ssm_conv1d.weight"]).reshape(
                    cfg.ssm_d_inner, cfg.ssm_d_conv), jnp.float32),
            "conv1d_b": load_dense(t[p + "ssm_conv1d.bias"]),
            "ssm_x": load_linear(t[p + "ssm_x.weight"], use_quant=use_quant),
            "ssm_dt": load_linear(t[p + "ssm_dt.weight"], use_quant=use_quant),
            "ssm_dt_b": load_dense(t[p + "ssm_dt.bias"]),
            "ssm_a": load_dense(t[p + "ssm_a.weight"]
                                if p + "ssm_a.weight" in t else t[p + "ssm_a"]),
            "ssm_d": load_dense(t[p + "ssm_d.weight"]
                                if p + "ssm_d.weight" in t else t[p + "ssm_d"]),
            "ssm_out": load_linear(t[p + "ssm_out.weight"], use_quant=use_quant),
        }
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _mamba_block(blk, x, cfg: ModelConfig, conv_state, ssm_state, interpret,
                 n_valid=None):
    """x: (B, T, E) normalized. Returns (y (B, T, d_inner->E), new states).

    ``n_valid``: number of real (non-padding) positions — recurrent state
    must not advance past it (prefill chunks are padded to shape buckets)."""
    b, t, _ = x.shape
    d_inner, d_conv = cfg.ssm_d_inner, cfg.ssm_d_conv
    d_state, dt_rank = cfg.ssm_d_state, cfg.ssm_dt_rank
    if n_valid is None:
        n_valid = jnp.int32(t)

    xz = blk["ssm_in"](x, interpret=interpret)            # (B, T, 2*d_inner)
    xs, z = xz[..., :d_inner], xz[..., d_inner:]

    # causal depthwise conv with carried tail (ggml_ssm_conv)
    xf = xs.astype(jnp.float32)
    xpad = jnp.concatenate([conv_state, xf], axis=1)      # (B, T+dc-1, d_inner)
    w = blk["conv1d"]                                     # (d_inner, d_conv)
    y = sum(xpad[:, k:k + t, :] * w[:, k][None, None, :]
            for k in range(d_conv))
    # conv tail ends at the last VALID position
    new_conv = jax.lax.dynamic_slice_in_dim(xpad, n_valid, d_conv - 1, axis=1)
    y = y + blk["conv1d_b"][None, None, :]
    xcv = y * jax.nn.sigmoid(y)                           # silu

    # projections for dt, B, C
    xdb = blk["ssm_x"](xcv.astype(jnp.bfloat16), interpret=interpret)
    dt_low = xdb[..., :dt_rank]
    B_t = xdb[..., dt_rank:dt_rank + d_state].astype(jnp.float32)
    C_t = xdb[..., dt_rank + d_state:].astype(jnp.float32)
    dt = blk["ssm_dt"](dt_low.astype(jnp.bfloat16), interpret=interpret)
    dt = (dt + blk["ssm_dt_b"]).astype(jnp.float32)       # (B, T, d_inner)

    A = blk["ssm_a"].reshape(d_inner, d_state)            # already -exp(A_log)
    D = blk["ssm_d"].reshape(d_inner)

    def step(state, inp):
        x_t, dt_t, b_t, c_t, idx = inp                    # (B, d_inner) ...
        dt_sp = jax.nn.softplus(dt_t)
        x_dt = x_t * dt_sp                                # (B, d_inner)
        decay = jnp.exp(dt_sp[..., None] * A[None])       # (B, d_inner, d_state)
        new_state = state * decay + b_t[:, None, :] * x_dt[..., None]
        new_state = jnp.where(idx < n_valid, new_state, state)
        y_t = jnp.einsum("bis,bs->bi", new_state, c_t)
        return new_state, y_t

    xcv_f = xcv.astype(jnp.float32)
    inputs = (xcv_f.swapaxes(0, 1), dt.swapaxes(0, 1),
              B_t.swapaxes(0, 1), C_t.swapaxes(0, 1),
              jnp.arange(t, dtype=jnp.int32))             # time-major
    new_ssm, ys = jax.lax.scan(step, ssm_state, inputs)
    ys = ys.swapaxes(0, 1)                                # (B, T, d_inner)

    ys = ys + xcv_f * D[None, None, :]
    zf = z.astype(jnp.float32)
    ys = ys * (zf * jax.nn.sigmoid(zf))
    out = blk["ssm_out"](ys.astype(jnp.bfloat16), interpret=interpret)
    return out, new_conv, new_ssm


def forward(params, cfg: ModelConfig, tokens, cache: MambaCache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            tp_axis: str | None = None, return_hidden: bool = False,
            return_layer_hiddens: bool = False, n_valid=None, **_):
    """tokens: (B, T) int32. n_past unused (recurrent state carries history);
    ``n_valid`` masks padded positions out of the state update."""
    b, t = tokens.shape
    x = params["tok_embd"][tokens]

    new_conv, new_ssm = [], []
    layer_hiddens = []
    for i, blk in enumerate(params["blocks"]):
        h = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        y, conv_i, ssm_i = _mamba_block(blk, h, cfg, cache.conv[i],
                                        cache.ssm[i], interpret,
                                        n_valid=n_valid)
        x = x + y.astype(x.dtype)
        if "cvec" in params:
            x = x + params["cvec"][i].astype(x.dtype)
        if return_layer_hiddens:
            layer_hiddens.append(x.astype(jnp.float32))
        new_conv.append(conv_i)
        new_ssm.append(ssm_i)

    cache = MambaCache(jnp.stack(new_conv), jnp.stack(new_ssm))
    if return_layer_hiddens:
        return jnp.stack(layer_hiddens), cache
    x = L.rms_norm(x, params["output_norm"], cfg.rms_eps)
    if return_hidden:
        return x.astype(jnp.float32), cache
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x, interpret=interpret).astype(jnp.float32)
    return logits, cache
