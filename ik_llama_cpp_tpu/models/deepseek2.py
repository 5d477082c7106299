"""DeepSeek-V2/V3 family: MLA attention + MoE with shared experts.

Mirrors build_deepseek2 (src/graphs/build_deepseek2.cpp:1213+):
  * q = q_b(rms(q_a(x))) (or direct wq for "lite"); split per head into
    (nope | rope) parts; kv_a_mqa(x) splits into (latent | shared k_rope)
  * k = concat(per-head k_nope from kv_b, broadcast roped k_pe);
    v from kv_b; head dims Dk = nope+rope, Dv = value_length
  * YaRN mscale pre-scaling: kq_scale = mscale^2 / sqrt(Dk),
    attn_factor_scaled = 1/(1 + 0.1 ln(1/freq_scale))  (llama.cpp #7416)
  * first n_layer_dense_lead layers use a dense FFN; the rest MoE with
    sigmoid/softmax gating, optional selection bias (exp_probs_b),
    weight normalization, scale, plus always-on shared experts

This is the full-KV ("mla=0"-semantics) path: K/V are materialized per head
and cached. The latent-cache absorb path (mla>=2) is a planned optimization
on the same module interface.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from ..ops.attention import attend
from ..ops.flash_attention import flash_attention
from ..ops.moe import GATING_SIGMOID, GATING_SOFTMAX, moe_ffn
from .config import ModelConfig
from .llama import KVCache, _load_experts, _sumsq
from .weights import _use_pallas, dequant_tensor, load_dense, load_linear


def load_deepseek2_params(gg: GGUFModel, cfg: ModelConfig, *, use_quant: bool = True,
                          mla: bool = True):
    """``mla=True`` enables the latent-cache absorb path (the reference's
    -mla 2/3, build_deepseek2.cpp:148-206): wk_b/wv_b per-head projections
    are derived from wkv_b at load (llm_prepare_mla, llama.cpp:2936) and the
    KV cache stores only [kv_lora_rank | rope] per token instead of
    per-head K/V — the memory feature that fits 160k-token DeepSeek contexts.
    mla=False keeps the full per-head K/V cache (mla=0 semantics; currently
    required for tensor-parallel serving)."""
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
            "wkv_a_mqa": load_linear(t[p + "attn_kv_a_mqa.weight"], use_quant=use_quant),
            "kv_a_norm": load_dense(t[p + "attn_kv_a_norm.weight"]),
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "ffn_norm": load_dense(t[p + "ffn_norm.weight"]),
        }
        presplit = p + "attn_k_b.weight" in t   # glm-dsa converters pre-split
        if not presplit:
            blk["wkv_b"] = load_linear(t[p + "attn_kv_b.weight"],
                                       use_quant=use_quant)
        d_nope, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
        if presplit:
            # create_glm_dsa_tensors (llama-load-tensors.cpp:3035-3058):
            # attn_k_b ne {d_nope, kv_lora, h}, attn_v_b ne {kv_lora, dv, h}
            kb = dequant_tensor(t[p + "attn_k_b.weight"]).reshape(
                cfg.n_head, cfg.n_lora_kv, d_nope)
            vb = dequant_tensor(t[p + "attn_v_b.weight"]).reshape(
                cfg.n_head, dv, cfg.n_lora_kv)
            blk["wk_b"] = jnp.asarray(
                np.ascontiguousarray(kb.transpose(0, 2, 1)), jnp.bfloat16)
            blk["wv_b"] = jnp.asarray(
                np.ascontiguousarray(vb.transpose(0, 2, 1)), jnp.bfloat16)
            if not mla:
                # reconstitute the fused wkv_b for the full-KV path
                kv_w = np.concatenate(
                    [kb.transpose(0, 2, 1), vb], axis=1)     # (h, nope+dv, l)
                from .weights import DenseLinear
                blk["wkv_b"] = DenseLinear(jnp.asarray(
                    np.ascontiguousarray(
                        kv_w.reshape(cfg.n_head * (d_nope + dv),
                                     cfg.n_lora_kv).T), jnp.bfloat16))
        elif mla:
            # derive per-head absorb projections from wkv_b (llm_prepare_mla)
            kvb_w = dequant_tensor(t[p + "attn_kv_b.weight"])  # (h*(nope+dv), lora_kv)
            kvb_w = kvb_w.reshape(cfg.n_head, d_nope + dv, cfg.n_lora_kv)
            blk["wk_b"] = jnp.asarray(
                np.ascontiguousarray(kvb_w[:, :d_nope, :]), jnp.bfloat16)
            blk["wv_b"] = jnp.asarray(
                np.ascontiguousarray(kvb_w[:, d_nope:, :].transpose(0, 2, 1)),
                jnp.bfloat16)   # (h, lora_kv, dv)
            del blk["wkv_b"]
        if p + "attn_q_a.weight" in t:  # full variant with q lora
            blk["wq_a"] = load_linear(t[p + "attn_q_a.weight"], use_quant=use_quant)
            blk["q_a_norm"] = load_dense(t[p + "attn_q_a_norm.weight"])
            blk["wq_b"] = load_linear(t[p + "attn_q_b.weight"], use_quant=use_quant)
        else:  # lite
            blk["wq"] = load_linear(t[p + "attn_q.weight"], use_quant=use_quant)
        if p + "indexer.attn_q_b.weight" in t:
            # DSA lightning indexer (build_deepseek2_dsa_indexer,
            # build_deepseek2.cpp:367-611): q from the q_a latent, MQA key
            # with (non-RMS) LayerNorm, per-head relu-score weights
            # router-class precision: top-k selection is a discrete
            # decision — int8 weight noise flips rank boundaries
            blk["idx_q_b"] = load_linear(t[p + "indexer.attn_q_b.weight"],
                                         use_quant=False)
            blk["idx_k"] = load_linear(t[p + "indexer.attn_k.weight"],
                                       use_quant=False)
            blk["idx_k_norm"] = load_dense(t[p + "indexer.k_norm.weight"])
            blk["idx_k_norm_b"] = load_dense(t[p + "indexer.k_norm.bias"])
            blk["idx_proj"] = load_linear(t[p + "indexer.proj.weight"],
                                          use_quant=False)
        if p + "ffn_gate_inp.weight" in t:
            blk["ffn_gate_inp"] = load_linear(t[p + "ffn_gate_inp.weight"], use_quant=False)
            blk["experts"] = _load_experts(t, p, use_quant=use_quant)
            if p + "exp_probs_b.bias" in t:
                blk["exp_probs_b"] = load_dense(t[p + "exp_probs_b.bias"])
            if p + "ffn_gate_shexp.weight" in t:
                blk["ffn_gate_shexp"] = load_linear(t[p + "ffn_gate_shexp.weight"], use_quant=use_quant)
                blk["ffn_up_shexp"] = load_linear(t[p + "ffn_up_shexp.weight"], use_quant=use_quant)
                blk["ffn_down_shexp"] = load_linear(t[p + "ffn_down_shexp.weight"], use_quant=use_quant)
        else:
            blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant)
            blk["ffn_up"] = load_linear(t[p + "ffn_up.weight"], use_quant=use_quant)
            blk["ffn_down"] = load_linear(t[p + "ffn_down.weight"], use_quant=use_quant)
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _dsa_topk_mask(blk, hcur, q_latent, cfg: ModelConfig, kr_cache, npv,
                   q_pos, cos, sin, *, interpret=False):
    """Lightning-indexer top-k key selection (build_deepseek2_dsa_indexer).

    Returns (allow_mask (B, T, S) bool, updated kr_cache (B, S, 1, HS)).
    score[j, i] = sum_h w[h, j] * relu(iq[h, j] . kr[i]) with the causal
    mask folded in; each sequence's FIRST key gets a +1e20 sink boost so it
    always survives selection (build_deepseek2.cpp:563-589). The reference's
    optional Walsh-Hadamard rotation is an F16-cache precision trick and is
    score-preserving — the bf16 TPU cache skips it (DSA_HADAMARD_DISABLE
    parity mode)."""
    ex = cfg.extra or {}
    b, t, _ = hcur.shape
    nh = int(ex["indexer_n_head"])
    hs = int(ex["indexer_head_size"])
    top_k = int(ex.get("dsa_top_k", 0)) or int(ex["indexer_top_k"])
    d_rope = cfg.qk_rope_head_dim

    iq = blk["idx_q_b"](q_latent, interpret=interpret)       # (B,T,nh*hs)
    iq = iq.reshape(b, t, nh, hs)
    iq_pe = L.apply_rope(iq[..., :d_rope], cos, sin, cfg.rope_type)
    iq = jnp.concatenate([iq_pe, iq[..., d_rope:]], axis=-1)

    ik = blk["idx_k"](hcur, interpret=interpret)             # (B,T,hs)
    ik = L.layer_norm(ik, blk["idx_k_norm"], blk["idx_k_norm_b"],
                      cfg.rms_eps)
    ik = ik.reshape(b, t, 1, hs)
    ik_pe = L.apply_rope(ik[..., :d_rope], cos, sin, cfg.rope_type)
    ik = jnp.concatenate([ik_pe, ik[..., d_rope:]], axis=-1)

    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    kr_cache = upd(kr_cache, ik.astype(kr_cache.dtype), npv)

    w = blk["idx_proj"](hcur, interpret=interpret)           # (B,T,nh)
    w = w.astype(jnp.float32) / math.sqrt(float(hs * nh))

    kr = kr_cache[:, :, 0, :].astype(jnp.float32)            # (B,S,HS)
    kq = jnp.einsum("bthd,bsd->bhts", iq.astype(jnp.float32), kr)
    score = jnp.einsum("bth,bhts->bts", w, jax.nn.relu(kq))  # (B,T,S)

    s_cap = kr_cache.shape[1]
    key_pos = jnp.arange(s_cap, dtype=jnp.int32)[None, None, :]
    kv_len = npv + t
    causal = (key_pos <= q_pos[:, :, None]) &         (key_pos < kv_len[:, None, None])
    score = jnp.where(causal, score, -jnp.inf)
    # sink boost: the sequence's first present key (cell 0 for this
    # runtime's from-zero caches) always survives top-k
    score = score + jnp.where(key_pos == 0, 1e20, 0.0)

    k_eff = min(top_k, s_cap)
    _, idx = jax.lax.top_k(score, k_eff)                     # (B,T,k)
    allow = jnp.zeros((b, t, s_cap), bool)
    allow = jnp.put_along_axis(allow, idx, True, axis=-1,
                               inplace=False)
    return allow & causal, kr_cache


def _mla_absorb_attention(blk, x, cfg: ModelConfig, kv_lat_cache, npv, q_pos,
                          cos, sin, kq_scale, interpret=False, tp_axis=None,
                          allow_mask=None):
    """Latent-cache attention (FlashMLA-3 absorb): cache rows are
    [latent(lora_kv) | roped k_pe(d_rope)] shared across heads (MQA); query
    nope parts are absorbed through wk_b so scores form directly against the
    latents, and the weighted latents re-project through wv_b."""
    b, t, _ = x.shape
    h = cfg.n_head
    d_rope = cfg.qk_rope_head_dim
    d_nope = cfg.qk_nope_head_dim
    dk = d_nope + d_rope
    lora_kv = cfg.n_lora_kv

    if "wq_a" in blk:
        q = blk["wq_a"](x, interpret=interpret)
        q = L.rms_norm(q, blk["q_a_norm"], cfg.rms_eps)
        q = blk["wq_b"](q, interpret=interpret)
    else:
        q = blk["wq"](x, interpret=interpret)
    q = q.reshape(b, t, h, dk)
    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]
    q_pe = L.apply_rope(q_pe, cos, sin, cfg.rope_type)

    kv_c = blk["wkv_a_mqa"](x, interpret=interpret)
    kv_lat = L.rms_norm(kv_c[..., :lora_kv], blk["kv_a_norm"], cfg.rms_eps)
    k_pe = L.apply_rope(kv_c[..., lora_kv:].reshape(b, t, 1, d_rope),
                        cos, sin, cfg.rope_type)

    # absorb: q_lat[h] = q_nope[h] @ wk_b[h]  (d_nope -> lora_kv)
    q_lat = jnp.einsum("bthd,hdl->bthl", q_nope.astype(jnp.float32),
                       blk["wk_b"].astype(jnp.float32))
    q_full = jnp.concatenate([q_lat, q_pe.astype(jnp.float32)], axis=-1)

    row = jnp.concatenate([kv_lat, k_pe[:, :, 0, :]], axis=-1)  # (B,T,Lk+R)
    row = row.reshape(b, t, 1, lora_kv + d_rope).astype(kv_lat_cache.dtype)
    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    kv_lat_cache = upd(kv_lat_cache, row, npv)

    kv_len = npv + t
    v_view = kv_lat_cache[..., :lora_kv]     # values = the latents themselves
    qb = q_full.astype(jnp.bfloat16)
    if allow_mask is not None:
        attn = attend(qb, kv_lat_cache, v_view, q_pos=q_pos,
                      kv_len=kv_len, scale=kq_scale, allow_mask=allow_mask)
    elif _use_pallas():
        attn = flash_attention(qb, kv_lat_cache, v_view, npv, kv_len,
                               scale=kq_scale)
    else:
        attn = attend(qb, kv_lat_cache, v_view, q_pos=q_pos,
                      kv_len=kv_len, scale=kq_scale)
    # re-project weighted latents per head: (B,T,H,lora_kv) @ (h,lora_kv,dv)
    out = jnp.einsum("bthl,hlv->bthv", attn.astype(jnp.float32),
                     blk["wv_b"].astype(jnp.float32))
    out = out.astype(jnp.bfloat16).reshape(b, t, h * cfg.v_head_dim)
    out = blk["wo"](out, interpret=interpret)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out, kv_lat_cache


def _mla_attention(blk, x, cfg: ModelConfig, kv_k, kv_v, npv, q_pos, cos, sin,
                   kq_scale, interpret=False, tp_axis=None):
    b, t, _ = x.shape
    h = cfg.n_head
    d_rope = cfg.qk_rope_head_dim
    d_nope = cfg.qk_nope_head_dim
    dk = d_nope + d_rope
    dv = cfg.v_head_dim
    lora_kv = cfg.n_lora_kv

    if "wq_a" in blk:
        q = blk["wq_a"](x, interpret=interpret)
        q = L.rms_norm(q, blk["q_a_norm"], cfg.rms_eps)
        q = blk["wq_b"](q, interpret=interpret)
    else:
        q = blk["wq"](x, interpret=interpret)
    q = q.reshape(b, t, h, dk)
    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]

    kv_c = blk["wkv_a_mqa"](x, interpret=interpret)  # (B, T, lora_kv + d_rope)
    kv_lat = kv_c[..., :lora_kv]
    k_pe = kv_c[..., lora_kv:].reshape(b, t, 1, d_rope)

    q_pe = L.apply_rope(q_pe, cos, sin, cfg.rope_type)
    k_pe = L.apply_rope(k_pe, cos, sin, cfg.rope_type)

    kv_lat = L.rms_norm(kv_lat, blk["kv_a_norm"], cfg.rms_eps)
    kvb = blk["wkv_b"](kv_lat, interpret=interpret).reshape(b, t, h, d_nope + dv)
    k_nope, v = kvb[..., :d_nope], kvb[..., d_nope:]

    k = jnp.concatenate([k_nope, jnp.broadcast_to(k_pe, (b, t, h, d_rope))], axis=-1)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)

    k = k.astype(kv_k.dtype)
    v = v.astype(kv_v.dtype)
    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    kv_k = upd(kv_k, k, npv)
    kv_v = upd(kv_v, v, npv)

    kv_len = npv + t
    if _use_pallas():
        attn = flash_attention(q.astype(jnp.bfloat16), kv_k, kv_v, npv, kv_len,
                               scale=kq_scale)
    else:
        attn = attend(q.astype(jnp.bfloat16), kv_k, kv_v, q_pos=q_pos,
                      kv_len=kv_len, scale=kq_scale)
    attn = attn.reshape(b, t, h * dv)
    out = blk["wo"](attn, interpret=interpret)
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    return out, kv_k, kv_v


def _ds_ffn(blk, h, cfg: ModelConfig, interpret=False):
    b, t, e = h.shape
    if "experts" not in blk:
        gate = blk["ffn_gate"](h, interpret=interpret)
        up = blk["ffn_up"](h, interpret=interpret)
        return blk["ffn_down"](L.swiglu(gate, up).astype(jnp.bfloat16),
                               interpret=interpret)
    router = blk["ffn_gate_inp"](h.reshape(-1, e), interpret=interpret)
    sel_bias = blk.get("exp_probs_b")
    y = moe_ffn(h.reshape(-1, e), router, blk["experts"], cfg.n_expert_used,
                gating=cfg.expert_gating_func,
                norm_topk=cfg.expert_weights_norm,
                scale=cfg.expert_weights_scale,
                selection_bias=sel_bias)
    y = y.reshape(b, t, e)
    if "ffn_gate_shexp" in blk:
        g = blk["ffn_gate_shexp"](h, interpret=interpret)
        u = blk["ffn_up_shexp"](h, interpret=interpret)
        y = y + blk["ffn_down_shexp"](L.swiglu(g, u).astype(jnp.bfloat16),
                                      interpret=interpret)
    return y


def forward(params, cfg: ModelConfig, tokens, kv: KVCache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            tp_axis: str | None = None, collect_stats: bool = False, **_):
    b, t = tokens.shape
    x = params["tok_embd"][tokens]

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]

    freq_scale = 1.0 / cfg.rope_scale_factor if cfg.rope_scale_factor else 1.0
    yarn = cfg.rope_scaling == "yarn" and freq_scale != 1.0
    # llama.cpp #7416 YaRN pre-scaling (build_deepseek2.cpp:1229-1233)
    if yarn:
        mscale = cfg.rope_attn_factor * (
            1.0 + cfg.rope_yarn_log_mul * math.log(1.0 / freq_scale))
        attn_factor_scaled = 1.0 / (1.0 + 0.1 * math.log(1.0 / freq_scale))
    else:
        mscale = 1.0
        attn_factor_scaled = 1.0
    dk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    kq_scale = mscale * mscale / math.sqrt(dk)

    cos, sin = L.rope_cache(
        q_pos, cfg.qk_rope_head_dim, cfg.rope_freq_base, freq_scale,
        ext_factor=1.0 if yarn else 0.0,
        attn_factor=attn_factor_scaled * cfg.rope_attn_factor if yarn else 1.0,
        n_ctx_orig=cfg.rope_orig_ctx or cfg.n_ctx_train)

    absorb = "wk_b" in params["blocks"][0]
    # DSA sparse attention: any layer carrying indexer tensors enables the
    # top-k path; IndexShare layers without their own indexer reuse the
    # last full layer's selection (build_deepseek2.cpp:796-815)
    dsa_on = (absorb and (cfg.extra or {}).get("dsa_enabled", True)
              and any("idx_q_b" in b for b in params["blocks"]))
    last_allow = None
    new_k, new_v = [], []
    for i, blk in enumerate(params["blocks"]):
        hcur = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps)
        if absorb:
            allow = None
            kr_i = kv.v[i]
            if dsa_on:
                if "idx_q_b" in blk:
                    q_lat = L.rms_norm(
                        blk["wq_a"](hcur, interpret=interpret),
                        blk["q_a_norm"], cfg.rms_eps)
                    allow, kr_i = _dsa_topk_mask(
                        blk, hcur, q_lat, cfg, kv.v[i], npv, q_pos,
                        cos, sin, interpret=interpret)
                    last_allow = allow
                else:
                    allow = last_allow
            attn_out, k_i = _mla_absorb_attention(
                blk, hcur, cfg, kv.k[i], npv, q_pos, cos, sin, kq_scale,
                interpret, tp_axis, allow_mask=allow)
            v_i = kr_i          # indexer-key cache (or placeholder)
        else:
            attn_out, k_i, v_i = _mla_attention(
                blk, hcur, cfg, kv.k[i], kv.v[i], npv, q_pos, cos, sin,
                kq_scale, interpret, tp_axis)
        x = x + attn_out.astype(x.dtype)
        hcur = L.rms_norm(x, blk["ffn_norm"], cfg.rms_eps)
        ff = _ds_ffn(blk, hcur, cfg, interpret=interpret)
        if tp_axis is not None:
            ff = jax.lax.psum(ff, tp_axis)
        x = x + ff.astype(x.dtype)
        new_k.append(k_i)
        new_v.append(v_i)

    kv = KVCache(jnp.stack(new_k), jnp.stack(new_v))
    x = L.rms_norm(x, params["output_norm"], cfg.rms_eps)
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x, interpret=interpret).astype(jnp.float32)
    if tp_axis is not None:
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
        logits = logits[..., :cfg.n_vocab]
    if collect_stats:
        return logits, kv, {}
    return logits, kv


def make_cache(cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, *, mla: bool = True) -> KVCache:
    if mla:
        # latent-only cache: [kv_lora_rank | rope] per token, one shared
        # "head" (the reference's mla>=2 compressed cache). For DSA models
        # the v slot holds the indexer-key cache (kr_l, llama.cpp kv_self)
        kshape = (cfg.n_layer, batch, capacity, 1,
                  cfg.n_lora_kv + cfg.qk_rope_head_dim)
        idx_hs = int((cfg.extra or {}).get("indexer_head_size", 0))
        vshape = ((cfg.n_layer, batch, capacity, 1, idx_hs) if idx_hs
                  else (cfg.n_layer, 1, 1, 1, 1))
        return KVCache(jnp.zeros(kshape, dtype), jnp.zeros(vshape, dtype))
    dk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    kshape = (cfg.n_layer, batch, capacity, cfg.n_head, dk)
    vshape = (cfg.n_layer, batch, capacity, cfg.n_head, cfg.v_head_dim)
    return KVCache(jnp.zeros(kshape, dtype), jnp.zeros(vshape, dtype))
