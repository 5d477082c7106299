"""Qwen3-Next: hybrid gated-delta-net / full-attention model family.

Mirrors build_qwen3next (src/graphs/build_qwen3next.cpp) + the delta_net
builders (src/llama-delta-net.cpp):
  * layers with (il+1) % 4 != 0 are RECURRENT (gated delta net): ssm_in
    projects per-k-head interleaved [q|k|v|z]; beta/alpha from
    ssm_beta_alpha (per-k-head [b|a]); gate g = ssm_a * softplus(a + dt_b);
    causal depthwise conv + silu over [q|k|v]; per-head l2-norm of q/k;
    the delta-net recurrence (ops/delta_net.py); output gated by
    rms_norm(o) * silu(z) then ssm_out
  * every 4th layer is standard attention with a GATED Q projection (wq
    holds per-head [q|gate]; output *= sigmoid(gate) before wo), qk norms,
    NEOX rope
  * every layer: qwen3moe-style MoE FFN (softmax top-k, norm_topk) with an
    optional sigmoid-gated shared expert; attn_post_norm doubles as ffn_norm

Hybrid cache: per-layer KV rows (attention layers) + conv tail and delta
state (recurrent layers) in one pytree.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from ..ops.attention import attend
from ..ops.delta_net import delta_net
from ..ops.flash_attention import flash_attention
from ..ops.moe import ExpertWeights, moe_ffn
from .config import ModelConfig
from .llama import _load_experts
from .weights import _use_pallas, dequant_tensor, load_dense, load_linear


def is_recurrent(il: int, interval: int = 4) -> bool:
    return (il + 1) % interval != 0


def _interval(cfg: ModelConfig) -> int:
    return int(cfg.extra.get("full_attn_interval", 4))


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridCache:
    """kv_k/kv_v: (L, B, S, Hkv, D) — used by attention layers only;
    conv: (L, B, d_conv-1, conv_dim); state: (L, B, Hv, Dv, Dv)."""

    k: Any
    v: Any
    conv: Any
    state: Any

    def tree_flatten(self):
        return (self.k, self.v, self.conv, self.state), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self):
        return self.k.shape[2]

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, **_):
        head_v_dim = cfg.ssm_d_inner // cfg.ssm_dt_rank
        key_dim = cfg.ssm_d_state * cfg.ssm_n_group
        conv_dim = 2 * key_dim + cfg.ssm_d_inner
        return cls(
            jnp.zeros((cfg.n_layer, batch, capacity, cfg.n_head_kv,
                       cfg.head_dim), dtype),
            jnp.zeros((cfg.n_layer, batch, capacity, cfg.n_head_kv,
                       cfg.head_dim), dtype),
            jnp.zeros((cfg.n_layer, batch, cfg.ssm_d_conv - 1, conv_dim),
                      jnp.float32),
            jnp.zeros((cfg.n_layer, batch, cfg.ssm_dt_rank, head_v_dim,
                       head_v_dim), jnp.float32),
        )


def load_qwen3next_params(gg: GGUFModel, cfg: ModelConfig, *,
                          use_quant: bool = True):
    t = gg.tensors
    params: dict[str, Any] = {}
    params["tok_embd"] = jnp.asarray(
        np.ascontiguousarray(dequant_tensor(t["token_embd.weight"])),
        jnp.bfloat16)
    params["output_norm"] = load_dense(t["output_norm.weight"])
    out_name = "output.weight" if "output.weight" in t else "token_embd.weight"
    params["output"] = load_linear(t[out_name], use_quant=use_quant)

    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            # attn_post_norm doubles as the FFN norm (load-tensors: ffn_norm
            # = attn_post_norm for qwen3next)
            "ffn_norm": load_dense(t[p + "post_attention_norm.weight"]),
        }
        if is_recurrent(i, _interval(cfg)):
            if p + "ssm_in.weight" in t:
                # qwen3next fused per-k-head [q|k|v|z] projection
                blk["ssm_in"] = load_linear(t[p + "ssm_in.weight"], use_quant=use_quant)
            else:
                # qwen35: flat [q|k|v] qkv + separate whole-width z gate
                # (create_qwen35_tensors; delta_net::build_qkvz overload)
                blk["wqkv_lin"] = load_linear(t[p + "attn_qkv.weight"], use_quant=use_quant)
                blk["wqkv_gate"] = load_linear(t[p + "attn_gate.weight"], use_quant=use_quant)
            blk["ssm_conv1d"] = jnp.asarray(
                dequant_tensor(t[p + "ssm_conv1d.weight"]).reshape(
                    -1, cfg.ssm_d_conv), jnp.float32)     # (conv_dim, d_conv)
            blk["ssm_dt_b"] = load_dense(t[p + "ssm_dt.bias"])
            blk["ssm_a"] = load_dense(t[p + "ssm_a"])
            if p + "ssm_ba.weight" in t:
                blk["ssm_ba"] = load_linear(t[p + "ssm_ba.weight"], use_quant=False)
            else:   # qwen35 separate beta/alpha (-> delta repeat_type 1)
                blk["ssm_beta"] = load_linear(t[p + "ssm_beta.weight"], use_quant=False)
                blk["ssm_alpha"] = load_linear(t[p + "ssm_alpha.weight"], use_quant=False)
            blk["ssm_norm"] = load_dense(t[p + "ssm_norm.weight"])
            blk["ssm_out"] = load_linear(t[p + "ssm_out.weight"], use_quant=use_quant)
        else:
            blk["wq"] = load_linear(t[p + "attn_q.weight"], use_quant=use_quant)
            blk["wk"] = load_linear(t[p + "attn_k.weight"], use_quant=use_quant)
            blk["wv"] = load_linear(t[p + "attn_v.weight"], use_quant=use_quant)
            blk["wo"] = load_linear(t[p + "attn_output.weight"], use_quant=use_quant)
            blk["attn_q_norm"] = load_dense(t[p + "attn_q_norm.weight"])
            blk["attn_k_norm"] = load_dense(t[p + "attn_k_norm.weight"])
        # MoE (qwen3moe-style) or dense FFN
        if p + "ffn_gate_inp.weight" in t:
            blk["ffn_gate_inp"] = load_linear(t[p + "ffn_gate_inp.weight"],
                                              use_quant=False)
            blk["experts"] = _load_experts(t, p, use_quant=use_quant)
            if p + "ffn_gate_shexp.weight" in t:
                blk["ffn_gate_shexp"] = load_linear(t[p + "ffn_gate_shexp.weight"], use_quant=use_quant)
                blk["ffn_up_shexp"] = load_linear(t[p + "ffn_up_shexp.weight"], use_quant=use_quant)
                blk["ffn_down_shexp"] = load_linear(t[p + "ffn_down_shexp.weight"], use_quant=use_quant)
                if p + "ffn_gate_inp_shexp.weight" in t:
                    blk["ffn_gate_inp_shexp"] = load_linear(
                        t[p + "ffn_gate_inp_shexp.weight"], use_quant=False)
        else:
            blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant)
            blk["ffn_up"] = load_linear(t[p + "ffn_up.weight"], use_quant=use_quant)
            blk["ffn_down"] = load_linear(t[p + "ffn_down.weight"], use_quant=use_quant)
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _l2_norm(x, eps):
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _delta_layer(blk, h, cfg: ModelConfig, conv_state, ssm_state, n_valid):
    """Gated delta-net sublayer. h: (B, T, E) normalized. Returns
    (out (B,T,E), new_conv, new_ssm)."""
    b, t, _ = h.shape
    dk = cfg.ssm_d_state
    hk = cfg.ssm_n_group
    hv = cfg.ssm_dt_rank
    dv = cfg.ssm_d_inner // hv
    r = hv // hk
    key_dim = dk * hk
    value_dim = dv * hv
    conv_dim = 2 * key_dim + value_dim
    eps = cfg.rms_eps

    if "ssm_in" in blk:
        # qwen3next: per-k-head interleaved [q(dk) | k(dk) | v(dv*r) | z(dv*r)]
        mixed = blk["ssm_in"](h).reshape(b, t, hk, 2 * dk + 2 * dv * r)
        q = mixed[..., :dk]                               # (B,T,Hk,dk)
        k = mixed[..., dk:2 * dk]
        v = mixed[..., 2 * dk:2 * dk + dv * r].reshape(b, t, hv, dv)
        z = mixed[..., 2 * dk + dv * r:].reshape(b, t, hv, dv)
        qkv = jnp.concatenate([q.reshape(b, t, key_dim),
                               k.reshape(b, t, key_dim),
                               v.reshape(b, t, value_dim)], axis=-1)
    else:
        # qwen35: already-flat [q | k | v] + separate whole-width z gate
        qkv = blk["wqkv_lin"](h)
        z = blk["wqkv_gate"](h).reshape(b, t, hv, dv)

    if "ssm_ba" in blk:
        # beta / alpha: per-k-head interleaved [b(r) | a(r)] -> repeat 0
        ba = blk["ssm_ba"](h).reshape(b, t, hk, 2 * r)
        beta = ba[..., :r].reshape(b, t, hv)
        alpha = ba[..., r:].reshape(b, t, hv)
        repeat_type = 0
    else:
        # qwen35 separate projections -> the reference passes repeat 1
        # (build_layer_attn_linear_core: ssm_beta_alpha ? 0 : 1)
        beta = blk["ssm_beta"](h)
        alpha = blk["ssm_alpha"](h)
        repeat_type = 1
    g = blk["ssm_a"] * jax.nn.softplus(alpha.astype(jnp.float32)
                                       + blk["ssm_dt_b"])

    # conv over [q_flat | k_flat | v_flat] with carried tail + silu
    qkv_f = qkv.astype(jnp.float32)
    xpad = jnp.concatenate([conv_state, qkv_f], axis=1)
    w = blk["ssm_conv1d"]                                 # (conv_dim, d_conv)
    y = sum(xpad[:, i:i + t, :] * w[:, i][None, None, :]
            for i in range(cfg.ssm_d_conv))
    new_conv = jax.lax.dynamic_slice_in_dim(xpad, n_valid, cfg.ssm_d_conv - 1,
                                            axis=1)
    y = y * jax.nn.sigmoid(y)                             # silu

    qc = _l2_norm(y[..., :key_dim].reshape(b, t, hk, dk), eps)
    kc = _l2_norm(y[..., key_dim:2 * key_dim].reshape(b, t, hk, dk), eps)
    vc = y[..., 2 * key_dim:].reshape(b, t, hv, dv)

    # mask padded positions: beta -> -inf makes sigmoid(beta)=0 and g -> 0
    # keeps decay=1, so S is unchanged there
    pos = jnp.arange(t, dtype=jnp.int32)
    live = (pos < n_valid)[None, :, None]
    beta = jnp.where(live, beta, -1e30)
    g = jnp.where(live, g, 0.0)

    out, new_ssm = delta_net(qc, kc, vc, g, beta, ssm_state,
                             repeat_type=repeat_type)

    # gated output: rms_norm(o) * silu(z), then ssm_out
    o = L.rms_norm(out.astype(jnp.float32), blk["ssm_norm"], eps)
    zf = z.astype(jnp.float32)
    o = o * (zf * jax.nn.sigmoid(zf))
    o = o.reshape(b, t, value_dim)
    return blk["ssm_out"](o.astype(jnp.bfloat16)), new_conv, new_ssm


def _gated_attention(blk, h, cfg: ModelConfig, kv_k, kv_v, npv, q_pos,
                    cos, sin):
    """Full-attention sublayer with per-head [q|gate] projection."""
    b, t, _ = h.shape
    nh, hkv, d = cfg.n_head, cfg.n_head_kv, cfg.head_dim

    qg = blk["wq"](h)
    if qg.shape[-1] == nh * 2 * d:
        # qwen3next gated q: per-head [q | gate]
        qg = qg.reshape(b, t, nh, 2 * d)
        q, gate = qg[..., :d], qg[..., d:]
    else:
        # qwen35: plain q, no output gate (build_std_attention path)
        q, gate = qg.reshape(b, t, nh, d), None
    k = blk["wk"](h).reshape(b, t, hkv, d)
    v = blk["wv"](h).reshape(b, t, hkv, d)
    q = L.rms_norm(q, blk["attn_q_norm"], cfg.rms_eps)
    k = L.rms_norm(k, blk["attn_k_norm"], cfg.rms_eps)
    q = L.apply_rope(q, cos, sin, cfg.rope_type)
    k = L.apply_rope(k, cos, sin, cfg.rope_type)

    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    kv_k = upd(kv_k, k.astype(kv_k.dtype), npv)
    kv_v = upd(kv_v, v.astype(kv_v.dtype), npv)
    kv_len = npv + t
    scale = 1.0 / float(np.sqrt(d))
    qb = q.astype(jnp.bfloat16)
    if _use_pallas():
        attn = flash_attention(qb, kv_k, kv_v, npv, kv_len, scale=scale)
    else:
        attn = attend(qb, kv_k, kv_v, q_pos=q_pos, kv_len=kv_len, scale=scale)
    attn = attn.astype(jnp.float32)
    if gate is not None:
        attn = attn * jax.nn.sigmoid(gate.astype(jnp.float32))
    attn = attn.reshape(b, t, nh * d)
    return blk["wo"](attn.astype(jnp.bfloat16)), kv_k, kv_v


def forward(params, cfg: ModelConfig, tokens, cache: HybridCache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            n_valid=None, **_):
    b, t = tokens.shape
    x = params["tok_embd"][tokens]
    if n_valid is None:
        n_valid = jnp.int32(t)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    rope_dims = cfg.rope_dim or cfg.head_dim
    cos, sin = L.rope_cache(q_pos, rope_dims, cfg.rope_freq_base)
    sections = (cfg.extra or {}).get("rope_sections") or []
    if sum(sections):
        # qwen35 imrope: pairs mapped to the "extra" stream carry position 0
        # for text tokens -> no rotation (ggml.c:20777; llama.cpp:6238-6257)
        mask = L.imrope_text_mask(sections, rope_dims)
        cos = jnp.where(mask, cos, 1.0)
        sin = jnp.where(mask, sin, 0.0)

    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for i, blk in enumerate(params["blocks"]):
        h = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        if is_recurrent(i, _interval(cfg)):
            out, conv_i, ssm_i = _delta_layer(blk, h, cfg, cache.conv[i],
                                              cache.state[i], n_valid)
            k_i, v_i = cache.k[i], cache.v[i]
        else:
            out, k_i, v_i = _gated_attention(blk, h, cfg, cache.k[i],
                                             cache.v[i], npv, q_pos, cos, sin)
            conv_i, ssm_i = cache.conv[i], cache.state[i]
        x = x + out.astype(x.dtype)
        h = L.rms_norm(x, blk["ffn_norm"], cfg.rms_eps)
        if "experts" in blk:
            e = x.shape[-1]
            router = blk["ffn_gate_inp"](h.reshape(-1, e))
            y = moe_ffn(h.reshape(-1, e), router, blk["experts"],
                        cfg.n_expert_used, norm_topk=True)
            y = y.reshape(b, t, e)
            if "ffn_gate_shexp" in blk:
                gsh = blk["ffn_gate_shexp"](h)
                ush = blk["ffn_up_shexp"](h)
                sh = blk["ffn_down_shexp"](
                    L.glu(gsh, ush, "silu").astype(jnp.bfloat16))
                if "ffn_gate_inp_shexp" in blk:
                    sgate = jax.nn.sigmoid(blk["ffn_gate_inp_shexp"](h))
                    sh = sh * sgate
                y = y + sh
            ff = y
        else:
            gate = blk["ffn_gate"](h)
            up = blk["ffn_up"](h)
            ff = blk["ffn_down"](L.glu(gate, up, "silu").astype(jnp.bfloat16))
        x = x + ff.astype(x.dtype)
        new_k.append(k_i)
        new_v.append(v_i)
        new_conv.append(conv_i)
        new_ssm.append(ssm_i)

    cache = HybridCache(jnp.stack(new_k), jnp.stack(new_v),
                        jnp.stack(new_conv), jnp.stack(new_ssm))
    x = L.rms_norm(x, params["output_norm"], cfg.rms_eps)
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x, interpret=interpret).astype(jnp.float32)
    return logits, cache
