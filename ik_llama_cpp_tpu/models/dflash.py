"""DFlash block-diffusion draft model — the TPU analogue of build_dflash /
build_dflash_kv_cache (src/graphs/build_dflash.cpp) and the llama-dflash.cpp
runtime.

A DFlash draft predicts a BLOCK of future tokens in one non-causal pass:

  * cross-context KV: hidden states captured from selected TARGET-model
    layers (dflash_target_layer_ids) are concatenated per position,
    projected by ``dflash_fc`` + rms ``dflash_hidden_norm`` into a fused
    context embedding; each draft layer projects that through its own
    wk/wv (k rms-normed then roped at the TARGET's rotary base,
    dflash_backbone_rotary_base) to form per-layer context K/V
    (build_dflash_kv_cache, build_dflash.cpp:7-201)
  * draft pass: the block [last_token, mask, mask, ...] runs through the
    draft layers; block K/V are appended after the context KV, and every
    block row attends ALL valid context rows plus the WHOLE block
    (bidirectional within the block — llama-dflash.cpp:605-637 fills the
    full mask with zeros over valid ctx slots and the entire block)
  * greedy draft tokens = argmax of the lm head at the mask rows
    (build_dflash.cpp:436-443 draft_argmax)

The laguna variant (dflash_laguna) additionally rms-norms each captured
feature slice (dflash_aux_hidden_norm.%d), re-norms the fused target with
each layer's attn_norm, gates attention with softplus head gates, and uses
a causal SWA mask instead of the bidirectional one.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from .config import ModelConfig
from .weights import dequant_tensor, load_dense, load_linear


def load_dflash_params(gg: GGUFModel, cfg: ModelConfig, *,
                       use_quant: bool = True):
    """create_dflash_tensors (llama-load-tensors.cpp:2330-2397)."""
    t = gg.tensors
    params: dict[str, Any] = {
        "output_norm": load_dense(t["output_norm.weight"]),
        "dflash_fc": load_linear(t["dflash_fc.weight"], use_quant=use_quant),
        "dflash_hidden_norm": load_dense(t["dflash_hidden_norm.weight"]),
    }
    if "token_embd.weight" in t:
        params["tok_embd"] = jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16)
    out_name = ("output_extra.weight" if "output_extra.weight" in t
                else "output.weight" if "output.weight" in t
                else "token_embd.weight")
    params["output"] = load_linear(t[out_name], use_quant=use_quant)
    aux = []
    i = 0
    while f"dflash_aux_hidden_norm.{i}.weight" in t:
        aux.append(load_dense(t[f"dflash_aux_hidden_norm.{i}.weight"]))
        i += 1
    if aux:
        params["aux_norms"] = aux

    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            "attn_post_norm": load_dense(t[p + "post_attention_norm.weight"]),
            "wq": load_linear(t[p + "attn_q.weight"], use_quant=use_quant),
            "wk": load_linear(t[p + "attn_k.weight"], use_quant=use_quant),
            "wv": load_linear(t[p + "attn_v.weight"], use_quant=use_quant),
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "attn_q_norm": load_dense(t[p + "attn_q_norm.weight"]),
            "attn_k_norm": load_dense(t[p + "attn_k_norm.weight"]),
            "ffn_gate": load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant),
            "ffn_up": load_linear(t[p + "ffn_up.weight"], use_quant=use_quant),
            "ffn_down": load_linear(t[p + "ffn_down.weight"], use_quant=use_quant),
        }
        for nm, key in (("attn_q.bias", "bq"), ("attn_k.bias", "bk"),
                        ("attn_v.bias", "bv"), ("attn_output.bias", "bo")):
            if p + nm in t:
                blk[key] = load_dense(t[p + nm])
        if p + "attn_sinks.weight" in t:
            blk["sinks"] = load_dense(t[p + "attn_sinks.weight"])
        if p + "attn_gate.weight" in t:
            blk["attn_gate"] = load_linear(t[p + "attn_gate.weight"],
                                           use_quant=use_quant)
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def fuse_target_features(params, cfg: ModelConfig, features, *,
                         interpret: bool = False):
    """(S, F) captured target features -> (S, E) fused context embedding
    (gemma-style norm chain of build_dflash_kv_cache:33-68)."""
    x = features.astype(jnp.float32)
    if "aux_norms" in params:               # laguna: per-slice rms norms
        n_t = len(params["aux_norms"])
        width = x.shape[-1] // n_t
        slices = [L.rms_norm(x[..., i * width:(i + 1) * width],
                             params["aux_norms"][i], cfg.rms_eps)
                  for i in range(n_t)]
        x = jnp.concatenate(slices, axis=-1)
    fused = params["dflash_fc"](x.astype(jnp.bfloat16), interpret=interpret)
    fused = L.rms_norm(fused.astype(jnp.float32),
                       params["dflash_hidden_norm"], cfg.rms_eps)
    return fused


def build_cross_kv(params, cfg: ModelConfig, features, positions, *,
                   interpret: bool = False):
    """Per-layer context K/V from fused target features.

    features: (S, F) f32; positions: (S,) int32 target positions.
    Returns (k (L, S, Hkv, D), v (L, S, Hkv, D)) bf16; K is roped at the
    TARGET's rotary base (build_dflash_kv_cache:95-101)."""
    ex = cfg.extra or {}
    s = features.shape[0]
    hkv, d = cfg.n_head_kv, cfg.head_dim
    fused = fuse_target_features(params, cfg, features, interpret=interpret)
    base = float(ex.get("backbone_rotary_base", 0.0)) or cfg.rope_freq_base
    cos, sin = L.rope_cache(positions[None, :], cfg.rope_dim or d, base)
    v_scale = float(ex.get("attn_v_scale", 1.0))
    ks, vs = [], []
    for blk in params["blocks"]:
        layer_in = fused
        if "aux_norms" in params:   # laguna re-norms with the layer attn_norm
            layer_in = L.rms_norm(fused, blk["attn_norm"], cfg.rms_eps)
        kb = blk["wk"](layer_in.astype(jnp.bfloat16), interpret=interpret)
        if "bk" in blk:
            kb = kb + blk["bk"]
        kb = kb.reshape(1, s, hkv, d)
        kb = L.rms_norm(kb, blk["attn_k_norm"], cfg.rms_eps)
        kb = L.apply_rope(kb, cos, sin, cfg.rope_type)
        vb = blk["wv"](layer_in.astype(jnp.bfloat16), interpret=interpret)
        if "bv" in blk:
            vb = vb + blk["bv"]
        if abs(v_scale - 1.0) > 1e-4:
            vb = vb * v_scale
        vb = vb.reshape(1, s, hkv, d)
        ks.append(kb[0].astype(jnp.bfloat16))
        vs.append(vb[0].astype(jnp.bfloat16))
    return jnp.stack(ks), jnp.stack(vs)


def draft_block(params, cfg: ModelConfig, tokens, positions, cross_k,
                cross_v, cross_valid, *, interpret: bool = False):
    """One block-diffusion draft pass (build_dflash, build_dflash.cpp:203+).

    tokens: (T,) [last_token, mask_id, ...]; positions: (T,) absolute;
    cross_k/v: (L, S, Hkv, D); cross_valid: (S,) bool.
    Returns logits (T, V) f32 — caller argmaxes rows 1.. for draft tokens
    (row j predicts the token at positions[j])."""
    ex = cfg.extra or {}
    t = tokens.shape[0]
    h_, hkv, d = cfg.n_head, cfg.n_head_kv, cfg.head_dim
    s = cross_k.shape[1]
    scale = 1.0 / math.sqrt(d)
    x = params["tok_embd"][tokens][None].astype(jnp.float32)   # (1, T, E)
    cos, sin = L.rope_cache(positions[None, :], cfg.rope_dim or d,
                            cfg.rope_freq_base)
    laguna = "aux_norms" in params
    swa = cfg.swa_window

    # mask (1, 1, T, S+T): all valid ctx slots + whole block (bidirectional);
    # laguna SWA drafts instead use causal-windowed visibility
    # (llama-dflash.cpp:605-700)
    ctx_vis = jnp.broadcast_to(cross_valid[None, :], (t, s))
    blk_vis = jnp.ones((t, t), bool)
    if laguna and swa > 0:
        qp = positions[:, None].astype(jnp.int32)
        # ctx row k holds target position k (positions are the slot map)
        kp = jnp.arange(s, dtype=jnp.int32)[None, :]
        ctx_vis = ctx_vis & ((qp - kp) < swa)
        bq = jnp.arange(t)[:, None]
        bk = jnp.arange(t)[None, :]
        blk_vis = (bk <= bq) & ((bq - bk) < swa)
    mask = jnp.concatenate([ctx_vis, blk_vis], axis=1)[None, None]

    for li, blk in enumerate(params["blocks"]):
        h = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        q = blk["wq"](h.astype(jnp.bfloat16), interpret=interpret)
        k = blk["wk"](h.astype(jnp.bfloat16), interpret=interpret)
        v = blk["wv"](h.astype(jnp.bfloat16), interpret=interpret)
        if "bq" in blk:
            q = q + blk["bq"]
        if "bk" in blk:
            k = k + blk["bk"]
        if "bv" in blk:
            v = v + blk["bv"]
        q = L.rms_norm(q.reshape(1, t, h_, d), blk["attn_q_norm"], cfg.rms_eps)
        q = L.apply_rope(q, cos, sin, cfg.rope_type)
        k = L.rms_norm(k.reshape(1, t, hkv, d), blk["attn_k_norm"], cfg.rms_eps)
        k = L.apply_rope(k, cos, sin, cfg.rope_type)
        v = v.reshape(1, t, hkv, d)
        v_scale = float((ex or {}).get("attn_v_scale", 1.0))
        if abs(v_scale - 1.0) > 1e-4:
            v = v * v_scale

        kc = jnp.concatenate([cross_k[li][None].astype(k.dtype), k], axis=1)
        vc = jnp.concatenate([cross_v[li][None].astype(v.dtype), v], axis=1)
        rep = h_ // hkv
        kf = jnp.repeat(kc.astype(jnp.float32), rep, axis=2)
        vf = jnp.repeat(vc.astype(jnp.float32), rep, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32), kf)
        scores = scores * scale
        scores = jnp.where(mask, scores, -1e30)
        if "sinks" in blk:
            sink = blk["sinks"].astype(jnp.float32).reshape(1, h_, 1, 1)
            m = jnp.maximum(jnp.max(scores, -1, keepdims=True), sink)
            e = jnp.exp(scores - m)
            probs = e / (jnp.sum(e, -1, keepdims=True) + jnp.exp(sink - m))
        else:
            probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs, vf)
        if "attn_gate" in blk:      # laguna softplus head gate
            gate = blk["attn_gate"](h.astype(jnp.bfloat16),
                                    interpret=interpret)
            attn = attn * jax.nn.softplus(gate.astype(jnp.float32))[..., None]
        out = blk["wo"](attn.reshape(1, t, h_ * d).astype(jnp.bfloat16),
                        interpret=interpret)
        if "bo" in blk:
            out = out + blk["bo"]
        x = x + out.astype(jnp.float32)

        h2 = L.rms_norm(x, blk["attn_post_norm"], cfg.rms_eps)
        g = blk["ffn_gate"](h2.astype(jnp.bfloat16), interpret=interpret)
        u = blk["ffn_up"](h2.astype(jnp.bfloat16), interpret=interpret)
        ff = blk["ffn_down"](
            L.glu(g.astype(jnp.float32), u.astype(jnp.float32), "silu"
                  ).astype(jnp.bfloat16), interpret=interpret)
        x = x + ff.astype(jnp.float32)

    x = L.rms_norm(x, params["output_norm"], cfg.rms_eps)
    logits = params["output"](x.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
    return logits[0]
