"""openPangu-2.0-Flash — the TPU analogue of build_openpangu
(src/graphs/build_openpangu.cpp) and its helpers
(llama-build-context.cpp:639-760 mHC; ggml.c:24164+ hc_pre/hc_post;
llama.cpp:3499 param-sink preparation).

GLM-DSA-style absorbed-MLA + sigmoid MoE base, plus the Pangu extras:

  * mHC / Hyper-Connections: S=4 parallel residual streams. Per sublayer a
    phi projection of the rms-normed flattened streams yields (S+2)*S mixing
    logits -> h_pre (sigmoid gate, combines streams into the sublayer input),
    h_post (2*sigmoid, scatters the sublayer output back), and an SxS
    Sinkhorn-normalized (mhc_recur_norm iters) stream-mixing matrix
    (ggml_compute_forward_hc_pre_f32). A global merge module collapses the
    streams before the lm head.
  * MoME: causal depthwise conv (k=3, residual) on the q-lora latent, the
    compressed-kv latent, and the pre-o_proj attention output; decode taps
    chain through a recurrent per-layer conv state.
  * param_sink: 128 learned latent-KV entries per layer, visible to every
    query outside the causal/window/top-k masks. sink keys =
    [rms(sink_kv, kv_a_norm) | sink_k_pe (rope-free)]; sink values = the
    normed latents themselves.
  * DSA + SWA schedule: swa_layers窗口 layers use the sliding-window mask,
    windowless base layers run the lightning indexer (rope on the FIRST
    n_rot dims) over a per-position indexer-key cache with top-k selection;
    schedule-less GGUFs run dense.
  * sandwich norms (attn_norm/post_attention_norm, ffn_norm/post_ffw_norm)
    + optional block_post_norm over the concatenated streams.
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from ..ops.moe import GATING_SIGMOID, moe_ffn
from .config import ModelConfig
from .llama import _load_experts
from .weights import dequant_tensor, load_dense, load_linear


@jax.tree_util.register_pytree_node_class
class PanguCache:
    """k: latent rows (L, B, S, 1, kv_lora+rope); kr: indexer keys
    (L, B, S, 1, idx_hs) or placeholder; conv: MoME taps (L, B, 2, C)."""

    def __init__(self, k, kr, conv):
        self.k, self.kr, self.conv = k, kr, conv

    def tree_flatten(self):
        return (self.k, self.kr, self.conv), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self):
        return self.k.shape[2]

    @property
    def quantized(self):
        return False

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.bfloat16, quant: bool = False):
        ex = cfg.extra or {}
        n_base = cfg.n_layer
        lat = cfg.n_lora_kv + cfg.qk_rope_head_dim
        idx_hs = int(ex.get("indexer_head_size", 0))
        c_tot = cfg.n_lora_q + cfg.n_lora_kv + cfg.n_head * cfg.v_head_dim
        return cls(
            jnp.zeros((n_base, batch, capacity, 1, lat), dtype),
            jnp.zeros((n_base, batch, capacity, 1, max(idx_hs, 1)), dtype),
            jnp.zeros((n_base, batch, 2, c_tot), jnp.float32))


def load_openpangu_params(gg: GGUFModel, cfg: ModelConfig, *,
                          use_quant: bool = True):
    """create_openpangu_tensors (llama-load-tensors.cpp:3140+) + the
    load-time param-sink derivation (llm_prepare_openpangu_param_sinks)."""
    t = gg.tensors
    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "output_norm": load_dense(t["output_norm.weight"]),
        "output": load_linear(t["output.weight"], use_quant=use_quant),
        "merge_phi": load_dense(t["merge_mhc_phi.weight"]),      # (S, S*E)
        "merge_alpha": load_dense(t["merge_mhc_alpha"]),
        "merge_beta": load_dense(t["merge_mhc_beta"]),
        "merge_gamma": load_dense(t["merge_mhc_gamma"]),
    }
    d_nope, dv = cfg.qk_nope_head_dim, cfg.v_head_dim
    eps = cfg.rms_eps
    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk: dict[str, Any] = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            "attn_post_norm": load_dense(t[p + "post_attention_norm.weight"]),
            "q_a_norm": load_dense(t[p + "attn_q_a_norm.weight"]),
            "kv_a_norm": load_dense(t[p + "attn_kv_a_norm.weight"]),
            "wq_a": load_linear(t[p + "attn_q_a.weight"], use_quant=use_quant),
            "wq_b": load_linear(t[p + "attn_q_b.weight"], use_quant=use_quant),
            "wkv_a_mqa": load_linear(t[p + "attn_kv_a_mqa.weight"],
                                     use_quant=use_quant),
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "ffn_norm": load_dense(t[p + "ffn_norm.weight"]),
            "ffn_post_norm": load_dense(t[p + "post_ffw_norm.weight"]),
            # MoME conv taps: ggml {3, C} -> numpy (C, 3) [w0 w1 w2]
            "qa_conv": jnp.asarray(dequant_tensor(t[p + "attn_qa_conv.weight"]),
                                   jnp.float32),
            "kv_conv": jnp.asarray(
                dequant_tensor(t[p + "attn_compresskv_conv.weight"]),
                jnp.float32),
            "o_conv": jnp.asarray(dequant_tensor(t[p + "attn_o_conv.weight"]),
                                  jnp.float32),
        }
        # pre-split absorb projections (same layout as glm-dsa)
        kb = dequant_tensor(t[p + "attn_k_b.weight"]).reshape(
            cfg.n_head, cfg.n_lora_kv, d_nope)
        vb = dequant_tensor(t[p + "attn_v_b.weight"]).reshape(
            cfg.n_head, dv, cfg.n_lora_kv)
        blk["wk_b"] = jnp.asarray(np.ascontiguousarray(
            kb.transpose(0, 2, 1)), jnp.bfloat16)           # (h, d_nope, l)
        blk["wv_b"] = jnp.asarray(np.ascontiguousarray(
            vb.transpose(0, 2, 1)), jnp.bfloat16)           # (h, l, dv)

        # param sinks: blk = [rms(kv, kv_a_norm) | k_pe] (NS, 576);
        # values = the normed latents (NS, 512)
        skv = dequant_tensor(t[p + "attn_param_sink_kv"])    # (NS, kv_lora)
        skpe = dequant_tensor(t[p + "attn_param_sink_k_pe"])  # (NS, rope)
        w = dequant_tensor(t[p + "attn_kv_a_norm.weight"])
        rms = np.sqrt((skv.astype(np.float64) ** 2).mean(-1, keepdims=True)
                      + eps)
        s_ckv = (skv / rms * w).astype(np.float32)
        blk["sink_keys"] = jnp.asarray(
            np.concatenate([s_ckv, skpe], axis=-1), jnp.float32)  # (NS, 576)
        blk["sink_vals"] = jnp.asarray(s_ckv, jnp.float32)        # (NS, 512)

        if p + "attn_indexer_q_b.weight" in t:
            blk["idx_q_b"] = load_linear(t[p + "attn_indexer_q_b.weight"],
                                         use_quant=False)
            blk["idx_k"] = load_linear(t[p + "attn_indexer_k.weight"],
                                       use_quant=False)
            blk["idx_k_norm"] = load_dense(t[p + "attn_indexer_k_norm.weight"])
            blk["idx_proj"] = load_linear(
                t[p + "attn_indexer_weights_proj.weight"], use_quant=False)

        for nm, key in (("attn_mhc_phi.weight", "mhc_a_phi"),
                        ("attn_mhc_alpha", "mhc_a_alpha"),
                        ("attn_mhc_beta", "mhc_a_beta"),
                        ("attn_mhc_gamma", "mhc_a_gamma"),
                        ("mlp_mhc_phi.weight", "mhc_m_phi"),
                        ("mlp_mhc_alpha", "mhc_m_alpha"),
                        ("mlp_mhc_beta", "mhc_m_beta"),
                        ("mlp_mhc_gamma", "mhc_m_gamma")):
            blk[key] = load_dense(t[p + nm])
        if p + "block_post_norm.weight" in t:
            blk["block_post_norm"] = load_dense(t[p + "block_post_norm.weight"])

        if p + "ffn_gate.weight" in t:       # dense lead
            blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant)
            blk["ffn_up"] = load_linear(t[p + "ffn_up.weight"], use_quant=use_quant)
            blk["ffn_down"] = load_linear(t[p + "ffn_down.weight"], use_quant=use_quant)
        else:
            blk["ffn_gate_inp"] = load_linear(t[p + "ffn_gate_inp.weight"],
                                              use_quant=False)
            blk["exp_probs_b"] = load_dense(t[p + "exp_probs_b.bias"])
            blk["experts"] = _load_experts(t, p, use_quant=use_quant)
            blk["ffn_gate_shexp"] = load_linear(t[p + "ffn_gate_shexp.weight"], use_quant=use_quant)
            blk["ffn_up_shexp"] = load_linear(t[p + "ffn_up_shexp.weight"], use_quant=use_quant)
            blk["ffn_down_shexp"] = load_linear(t[p + "ffn_down_shexp.weight"], use_quant=use_quant)
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _sinkhorn_mix(mixes, alpha, beta, s: int, iters: int, eps: float = 0.0):
    """ggml_compute_forward_hc_pre_f32 (ggml.c:24166).

    mixes: (B, T, S*S + 2S) f32 -> (h_pre (B,T,S), h_post (B,T,S),
    comb (B,T,S,S) row=src? comb[r, c]: Sinkhorn of x_comb reshaped (S, S)).
    eps: DSv4 dsv4_hc_eps regularizer — added to the sigmoid pre gate, the
    row softmax, and every Sinkhorn normalization denominator (openPangu
    uses eps = 0)."""
    a = alpha.astype(jnp.float32)
    b = beta.astype(jnp.float32)
    h_pre = jax.nn.sigmoid(mixes[..., :s] * a[0] + b[:s]) + eps
    h_post = 2.0 * jax.nn.sigmoid(mixes[..., s:2 * s] * a[1] + b[s:2 * s])
    m = mixes[..., 2 * s:] * a[2] + b[2 * s:]
    m = m.reshape(mixes.shape[:-1] + (s, s))
    m = jax.nn.softmax(m, axis=-1) + eps                # row softmax
    m = m / (jnp.sum(m, axis=-2, keepdims=True) + eps)  # col normalize
    for _ in range(iters - 1):
        m = m / (jnp.sum(m, axis=-1, keepdims=True) + eps)
        m = m / (jnp.sum(m, axis=-2, keepdims=True) + eps)
    return h_pre, h_post, m


def _mhc_pre(R, phi, alpha, beta, gamma, s, iters, eps):
    """R (B,T,S,E) -> (x (B,T,E), h_post, comb)."""
    b, t, _, e = R.shape
    flat = R.reshape(b, t, s * e)
    normed = L.rms_norm(flat, gamma, eps)
    mixes = jnp.einsum("btf,mf->btm", normed.astype(jnp.float32),
                       phi.astype(jnp.float32))
    h_pre, h_post, comb = _sinkhorn_mix(mixes, alpha, beta, s, iters)
    x = jnp.einsum("bts,btse->bte", h_pre, R.astype(jnp.float32))
    return x, h_post, comb


def _mhc_post(y, h_post, R, comb):
    """R_new[:, :, i] = h_post[i]*y + sum_j comb[j, i] * R[:, :, j]
    (ggml_compute_forward_hc_post_f32: comb_r[j*S + i])."""
    yf = y.astype(jnp.float32)
    term1 = h_post[..., :, None] * yf[:, :, None, :]
    term2 = jnp.einsum("btji,btje->btie", comb, R.astype(jnp.float32))
    return term1 + term2


def _causal_conv(x, w, state, npv, off):
    """MoME residual depthwise conv k=3 (openpangu_causal_conv).

    x: (B, T, C) f32; w: (C, 3) taps [w0 w1 w2] for [t-2, t-1, t];
    state: (B, 2, Ctot) holding [x[t-2], x[t-1]] at channel offset off.
    Resets history at sequence start (npv == 0). Returns (y, new_state)."""
    bsz, t, c = x.shape
    st = state[:, :, off:off + c]
    st = jnp.where((npv == 0)[:, None, None], 0.0, st)
    xf = x.astype(jnp.float32)
    xp = jnp.concatenate([st, xf], axis=1)              # (B, T+2, C)
    conv = (xp[:, 0:t] * w[:, 0] + xp[:, 1:t + 1] * w[:, 1]
            + xp[:, 2:t + 2] * w[:, 2])
    new_tail = xp[:, t:t + 2]                            # last two inputs
    new_state = jax.lax.dynamic_update_slice(
        state, new_tail.astype(state.dtype), (0, 0, off))
    return xf + conv, new_state


def forward(params, cfg: ModelConfig, tokens, kv: PanguCache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            n_valid=None, return_hidden: bool = False, **kwargs):
    ex = cfg.extra or {}
    b, t = tokens.shape
    e = cfg.n_embd
    s = int(ex.get("mhc_num_stream", 4))
    iters = int(ex.get("mhc_recur_norm", 20))
    eps = cfg.rms_eps
    h_ = cfg.n_head
    d_nope, d_rope, dv = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                          cfg.v_head_dim)
    lora_kv, lora_q = cfg.n_lora_kv, cfg.n_lora_q
    kq_scale = 1.0 / math.sqrt(d_nope + d_rope)
    top_k = int(ex.get("dsa_top_k", 0)) or int(ex.get("indexer_top_k", 0))
    idx_nh = int(ex.get("indexer_n_head", 0))
    idx_hs = int(ex.get("indexer_head_size", 0))
    s_cap = kv.capacity

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    kv_len = npv + t
    cos, sin = L.rope_cache(q_pos, d_rope, cfg.rope_freq_base)
    key_pos = jnp.arange(s_cap, dtype=jnp.int32)[None, None, :]
    causal = (key_pos <= q_pos[:, :, None]) & (key_pos < kv_len[:, None, None])

    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))

    x0 = params["tok_embd"][tokens].astype(jnp.float32)
    R = jnp.broadcast_to(x0[:, :, None, :], (b, t, s, e))

    off_qa, off_ckv, off_o = 0, lora_q, lora_q + lora_kv
    for i, blk in enumerate(params["blocks"]):
        conv_state = kv.conv[i]
        # ---------------- attention sublayer ----------------
        x, h_post_a, comb_a = _mhc_pre(R, blk["mhc_a_phi"], blk["mhc_a_alpha"],
                                       blk["mhc_a_beta"], blk["mhc_a_gamma"],
                                       s, iters, eps)
        hN = L.rms_norm(x, blk["attn_norm"], eps)

        q_lora = blk["wq_a"](hN.astype(jnp.bfloat16), interpret=interpret)
        q_lora, conv_state = _causal_conv(q_lora, blk["qa_conv"], conv_state,
                                          npv, off_qa)
        q_lora = L.rms_norm(q_lora, blk["q_a_norm"], eps)
        q = blk["wq_b"](q_lora.astype(jnp.bfloat16), interpret=interpret)
        q = q.reshape(b, t, h_, d_nope + d_rope)
        q_pe = L.apply_rope(q[..., d_nope:], cos, sin, cfg.rope_type)
        q_lat = jnp.einsum("bthd,hdl->bthl", q[..., :d_nope].astype(jnp.float32),
                           blk["wk_b"].astype(jnp.float32))
        q_all = jnp.concatenate([q_lat, q_pe.astype(jnp.float32)], axis=-1)

        kvp = blk["wkv_a_mqa"](hN.astype(jnp.bfloat16), interpret=interpret)
        ckv, conv_state = _causal_conv(kvp[..., :lora_kv], blk["kv_conv"],
                                       conv_state, npv, off_ckv)
        ckv = L.rms_norm(ckv, blk["kv_a_norm"], eps)
        k_pe = L.apply_rope(kvp[..., lora_kv:].reshape(b, t, 1, d_rope),
                            cos, sin, cfg.rope_type)
        row = jnp.concatenate([ckv, k_pe[:, :, 0, :].astype(jnp.float32)],
                              axis=-1)
        new_k = upd(kv.k[i], row[:, :, None, :].astype(kv.k.dtype), npv)
        kv.k = kv.k.at[i].set(new_k)

        is_swa = cfg.layer_is_swa(i)
        mask = causal
        if is_swa and cfg.swa_window > 0:
            mask = mask & (key_pos > q_pos[:, :, None] - cfg.swa_window)
        elif "idx_q_b" in blk and top_k > 0:
            # lightning indexer (rope on the FIRST n_rot dims of q/k)
            iq = blk["idx_q_b"](q_lora.astype(jnp.bfloat16),
                                interpret=interpret).reshape(b, t, idx_nh,
                                                             idx_hs)
            iq = jnp.concatenate(
                [L.apply_rope(iq[..., :d_rope], cos, sin, cfg.rope_type),
                 iq[..., d_rope:]], axis=-1)
            ik = blk["idx_k"](hN.astype(jnp.bfloat16), interpret=interpret)
            ik = L.rms_norm(ik, blk["idx_k_norm"], eps).reshape(b, t, 1, idx_hs)
            ik = jnp.concatenate(
                [L.apply_rope(ik[..., :d_rope], cos, sin, cfg.rope_type),
                 ik[..., d_rope:]], axis=-1)
            new_kr = upd(kv.kr[i], ik.astype(kv.kr.dtype), npv)
            kv.kr = kv.kr.at[i].set(new_kr)
            w_idx = blk["idx_proj"](hN.astype(jnp.bfloat16),
                                    interpret=interpret).astype(jnp.float32)
            w_idx = w_idx / math.sqrt(float(idx_hs * idx_nh))
            krf = new_kr[:, :, 0, :].astype(jnp.float32)
            kq = jnp.einsum("bthd,bsd->bhts", iq.astype(jnp.float32), krf)
            score = jnp.einsum("bth,bhts->bts", w_idx, jax.nn.relu(kq))
            score = jnp.where(mask, score, -jnp.inf)
            k_eff = min(top_k, s_cap)
            _, sel = jax.lax.top_k(score, k_eff)
            allow = jnp.zeros((b, t, s_cap), bool)
            allow = jnp.put_along_axis(allow, sel, True, axis=-1,
                                       inplace=False)
            mask = mask & allow

        # latent attention over [sinks ++ cache]
        lat = new_k[:, :, 0, :].astype(jnp.float32)          # (B, S, 576)
        kq_cache = jnp.einsum("bthl,bsl->bhts", q_all, lat) * kq_scale
        kq_cache = jnp.where(mask[:, None], kq_cache, -jnp.float32(1e30))
        kq_sink = jnp.einsum("bthl,nl->bhtn", q_all,
                             blk["sink_keys"].astype(jnp.float32)) * kq_scale
        kq = jnp.concatenate([kq_sink, kq_cache], axis=-1)
        probs = jax.nn.softmax(kq, axis=-1)
        ns = blk["sink_keys"].shape[0]
        out_lat = (jnp.einsum("bhtn,nl->bthl", probs[..., :ns],
                              blk["sink_vals"].astype(jnp.float32))
                   + jnp.einsum("bhts,bsl->bthl", probs[..., ns:],
                                lat[..., :lora_kv]))
        out_h = jnp.einsum("bthl,hlv->bthv", out_lat,
                           blk["wv_b"].astype(jnp.float32))
        merged = out_h.reshape(b, t, h_ * dv)
        merged, conv_state = _causal_conv(merged, blk["o_conv"], conv_state,
                                          npv, off_o)
        y = blk["wo"](merged.astype(jnp.bfloat16), interpret=interpret)
        y = L.rms_norm(y.astype(jnp.float32), blk["attn_post_norm"], eps)
        if isinstance(kwargs.get("_trace"), list):
            kwargs["_trace"].append(("attn_postnorm", i, y))
        R = _mhc_post(y, h_post_a, R, comb_a)

        # ---------------- ffn sublayer ----------------
        xm, h_post_m, comb_m = _mhc_pre(R, blk["mhc_m_phi"],
                                        blk["mhc_m_alpha"], blk["mhc_m_beta"],
                                        blk["mhc_m_gamma"], s, iters, eps)
        hM = L.rms_norm(xm, blk["ffn_norm"], eps)
        if "experts" in blk:
            router = blk["ffn_gate_inp"](hM.reshape(-1, e).astype(jnp.bfloat16),
                                         interpret=interpret)
            ff = moe_ffn(hM.reshape(-1, e).astype(jnp.float32),
                         router.astype(jnp.float32), blk["experts"],
                         cfg.n_expert_used, gating=cfg.expert_gating_func,
                         norm_topk=cfg.expert_weights_norm,
                         scale=cfg.expert_weights_scale,
                         selection_bias=blk["exp_probs_b"]).reshape(b, t, e)
            g = blk["ffn_gate_shexp"](hM.astype(jnp.bfloat16), interpret=interpret)
            u = blk["ffn_up_shexp"](hM.astype(jnp.bfloat16), interpret=interpret)
            ff = ff + blk["ffn_down_shexp"](
                L.swiglu(g, u).astype(jnp.bfloat16),
                interpret=interpret).astype(jnp.float32)
        else:
            g = blk["ffn_gate"](hM.astype(jnp.bfloat16), interpret=interpret)
            u = blk["ffn_up"](hM.astype(jnp.bfloat16), interpret=interpret)
            ff = blk["ffn_down"](L.swiglu(g, u).astype(jnp.bfloat16),
                                 interpret=interpret).astype(jnp.float32)
        ff = L.rms_norm(ff, blk["ffn_post_norm"], eps)
        if isinstance(kwargs.get("_trace"), list):
            kwargs["_trace"].append(("ffn_postnorm", i, ff))
        R = _mhc_post(ff, h_post_m, R, comb_m)

        if "block_post_norm" in blk:
            flat = R.reshape(b, t, s * e)
            R = L.rms_norm(flat, blk["block_post_norm"], eps).reshape(
                b, t, s, e)
        kv.conv = kv.conv.at[i].set(conv_state)

    # mHC tail merge (build_openpangu.cpp:1247-1256)
    flat = R.reshape(b, t, s * e)
    normed = L.rms_norm(flat, params["merge_gamma"], eps)
    w = jnp.einsum("btf,sf->bts", normed.astype(jnp.float32),
                   params["merge_phi"].astype(jnp.float32))
    w = jax.nn.sigmoid(w * params["merge_alpha"].astype(jnp.float32)[0]
                       + params["merge_beta"].astype(jnp.float32))
    x = jnp.einsum("bts,btse->bte", w, R.astype(jnp.float32))

    x = L.rms_norm(x, params["output_norm"], eps)
    if return_hidden:
        return x.astype(jnp.float32), kv
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
    return logits, kv
