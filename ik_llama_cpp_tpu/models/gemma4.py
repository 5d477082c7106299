"""Gemma4 (Gemma-3n-style) decoder — the TPU analogue of build_gemma4
(src/graphs/build_gemma4.cpp:895-1148).

Distinctive structure vs the gemma3 path in models/llama.py:
  * per-layer input embeddings: a second embedding table
    (per_layer_token_embd) plus a projection of the main embedding
    (per_layer_model_proj), combined and gated into every layer's output
    (gemma4_project_per_layer_inputs, build_gemma4.cpp:874-893, 1096-1117)
  * shared-KV layers: the trailing `shared_kv_layers` layers compute only Q
    and attend over the KV cache of the LAST full/sliding KV layer
    (llama-build-context.cpp:1967-1971; llama-hparams.h:251 has_kv)
  * weightless RMS norm on V (build_gemma4.cpp Vcur_normed;
    llama-build-context.cpp:3341-3344)
  * raw (unscaled) attention scores — f_attention_scale = 1.0
    (llama-hparams.cpp:860)
  * dual FFN on MoE layers: a dense gelu-par "shared" FFN and an expert FFN
    run in parallel on differently-normed attention output; combined as
    rms(mlp)*post_ffw_norm_1 + rms(moe)*post_ffw_norm_2, then post_ffw_norm,
    then residual (build_gemma4.cpp:1032-1078)
  * MoE router operates on the RAW attention output (normed by
    ffn_gate_inp_s), not the expert input; experts store fused gate|up
    (gate = first half — ggml.c:18584-18586) and an optional per-expert
    down scale folded into the routing weights
  * per-layer out_scale scalar; final logit softcap 30
  * global layers rope with a shared `rope_freqs` factor table dividing
    theta (ggml.c:20731); SWA layers rope at freq_base_swa with n_rot_swa
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
from ..ops.moe import ExpertWeights, moe_ffn, GATING_SOFTMAX
from .config import ModelConfig
from .weights import dequant_tensor, load_dense, load_linear


@jax.tree_util.register_pytree_node_class
class Gemma4Cache:
    """KV cache over the first n_kv layers only (has_kv layers); shared
    layers read slots n_kv-2 (sliding) / n_kv-1 (global)."""

    def __init__(self, k, v):
        self.k = k   # (n_kv, B, S, Hkv, D)
        self.v = v

    def tree_flatten(self):
        return (self.k, self.v), ()

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
        n_kv = int(ex.get("n_kv_layers", cfg.n_layer))
        d = max(cfg.head_dim, int(ex.get("head_dim_swa", cfg.head_dim)))
        shape = (n_kv, batch, capacity, cfg.n_head_kv, d)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def load_gemma4_params(gg: GGUFModel, cfg: ModelConfig, *,
                       use_quant: bool = True):
    """create_gemma4_tensors (llama-load-tensors.cpp:2161-2265)."""
    t = gg.tensors
    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "output_norm": load_dense(t["output_norm.weight"]),
    }
    out_name = "output.weight" if "output.weight" in t else "token_embd.weight"
    params["output"] = load_linear(t[out_name], use_quant=use_quant)
    if "per_layer_token_embd.weight" in t:
        params["tok_embd_per_layer"] = jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["per_layer_token_embd.weight"])), jnp.bfloat16)
        params["per_layer_model_proj"] = load_linear(
            t["per_layer_model_proj.weight"], use_quant=use_quant)
        params["per_layer_proj_norm"] = load_dense(
            t["per_layer_proj_norm.weight"])
    if "rope_freqs.weight" in t:
        params["rope_freqs"] = load_dense(t["rope_freqs.weight"])

    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk: dict[str, Any] = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            "wq": load_linear(t[p + "attn_q.weight"], use_quant=use_quant),
            "wo": load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
            "attn_q_norm": load_dense(t[p + "attn_q_norm.weight"]),
            "attn_post_norm": load_dense(t[p + "post_attention_norm.weight"]),
            "ffn_norm": load_dense(t[p + "ffn_norm.weight"]),
            "ffn_gate": load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant),
            "ffn_up": load_linear(t[p + "ffn_up.weight"], use_quant=use_quant),
            "ffn_down": load_linear(t[p + "ffn_down.weight"], use_quant=use_quant),
            "ffn_post_norm": load_dense(t[p + "post_ffw_norm.weight"]),
        }
        if p + "attn_k.weight" in t:
            blk["wk"] = load_linear(t[p + "attn_k.weight"], use_quant=use_quant)
            blk["attn_k_norm"] = load_dense(t[p + "attn_k_norm.weight"])
        if p + "attn_v.weight" in t:
            blk["wv"] = load_linear(t[p + "attn_v.weight"], use_quant=use_quant)
        if p + "layer_output_scale.weight" in t:
            blk["out_scale"] = load_dense(t[p + "layer_output_scale.weight"])
        if p + "ffn_gate_inp.weight" in t:       # MoE layer
            blk["ffn_gate_inp"] = load_linear(t[p + "ffn_gate_inp.weight"],
                                              use_quant=False)
            blk["ffn_gate_inp_s"] = load_dense(t[p + "ffn_gate_inp.scale"])
            blk["ffn_pre_norm_2"] = load_dense(t[p + "pre_ffw_norm_2.weight"])
            blk["ffn_post_norm_1"] = load_dense(t[p + "post_ffw_norm_1.weight"])
            blk["ffn_post_norm_2"] = load_dense(t[p + "post_ffw_norm_2.weight"])
            # fused gate|up experts: ne = (E, 2*FF, n_exp); GATE is the first
            # FF rows (src0_2_cur at offset 0, ggml.c:18584-18586)
            gu = dequant_tensor(t[p + "ffn_gate_up_exps.weight"])
            n_exp, two_ff, e = gu.shape
            ff = two_ff // 2
            gate = np.ascontiguousarray(gu[:, :ff, :].transpose(0, 2, 1))
            up = np.ascontiguousarray(gu[:, ff:, :].transpose(0, 2, 1))
            dn = dequant_tensor(t[p + "ffn_down_exps.weight"])
            down = np.ascontiguousarray(dn.transpose(0, 2, 1))
            blk["experts"] = ExpertWeights(
                gate=jnp.asarray(gate, jnp.bfloat16),
                up=jnp.asarray(up, jnp.bfloat16),
                down=jnp.asarray(down, jnp.bfloat16))
            if p + "ffn_down_exps.scale" in t:
                blk["down_exps_s"] = load_dense(t[p + "ffn_down_exps.scale"])
        if p + "inp_gate.weight" in t:           # per-layer embedding gates
            blk["pl_inp_gate"] = load_linear(t[p + "inp_gate.weight"],
                                             use_quant=use_quant)
            blk["pl_proj"] = load_linear(t[p + "proj.weight"],
                                         use_quant=use_quant)
            blk["pl_post_norm"] = load_dense(t[p + "post_norm.weight"])
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _lin(blk, name, x, interpret):
    return blk[name](x.astype(jnp.bfloat16), interpret=interpret)


def forward(params, cfg: ModelConfig, tokens, kv: Gemma4Cache, n_past,
            *, interpret: bool = False, logits_last_only: bool = False,
            n_valid=None, return_hidden: bool = False, inputs_embeds=None,
            **_):
    """tokens (B, T) -> (logits, cache). build_gemma4.cpp:895-1148."""
    ex = cfg.extra or {}
    b, t = tokens.shape
    e = cfg.n_embd
    eps = cfg.rms_eps
    n_kv = int(ex.get("n_kv_layers", cfg.n_layer))
    d_swa = int(ex.get("head_dim_swa", cfg.head_dim))
    n_rot_swa = int(ex.get("n_rot_swa", cfg.rope_dim or cfg.head_dim))
    d_cache = kv.k.shape[-1]

    if inputs_embeds is not None:
        x = inputs_embeds.astype(jnp.float32)
    else:
        x = params["tok_embd"][tokens].astype(jnp.float32) * math.sqrt(e)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    kv_len = npv + t

    # per-layer inputs (gemma4_project_per_layer_inputs)
    inp_per_layer = None
    if "tok_embd_per_layer" in params:
        epl = params["per_layer_proj_norm"].shape[0]
        ipl = params["tok_embd_per_layer"][tokens].astype(jnp.float32)
        ipl = ipl.reshape(b, t, cfg.n_layer, epl) * math.sqrt(epl)
        proj = _lin(params, "per_layer_model_proj", x, interpret)
        proj = proj.astype(jnp.float32).reshape(b, t, cfg.n_layer, epl)
        # note: llm_build_norm is called with scale_eps = n_embd, i.e. the
        # effective rms eps is n_embd * rms_eps (build_gemma4.cpp:882-883)
        proj = L.rms_norm(proj, params["per_layer_proj_norm"], e * eps)
        inp_per_layer = (proj + ipl) * (1.0 / math.sqrt(2.0))  # (B,T,L,Epl)

    # rope tables: global layers divide theta by the shared rope_freqs
    # factors (ggml.c:20731 theta/ff); SWA layers use freq_base_swa
    rope_dims = cfg.rope_dim or cfg.head_dim
    ff = params.get("rope_freqs")
    pos_f = q_pos.astype(jnp.float32)[..., None]
    half = rope_dims // 2
    dims = jnp.arange(0, half, dtype=jnp.float32)
    theta = pos_f / (cfg.rope_freq_base ** (dims / half))
    if ff is not None:
        theta = theta / ff.astype(jnp.float32)[:half]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    base_swa = cfg.rope_freq_base_swa or 10000.0
    cos_swa, sin_swa = L.rope_cache(q_pos, n_rot_swa, base_swa)

    for i, blk in enumerate(params["blocks"]):
        is_swa = cfg.layer_is_swa(i)
        d_l = d_swa if is_swa else cfg.head_dim
        h_l = cfg.n_head_arr[i] if cfg.n_head_arr else cfg.n_head
        c_l, s_l = (cos_swa, sin_swa) if is_swa else (cos, sin)
        window = cfg.swa_window if is_swa else 0

        # ---- attention ----
        h = L.rms_norm(x, blk["attn_norm"], eps)
        q = _lin(blk, "wq", h, interpret).reshape(b, t, h_l, d_l)
        q = L.rms_norm(q, blk["attn_q_norm"], eps)
        q = L.apply_rope(q, c_l, s_l, L.ROPE_TYPE_NEOX)
        if i < n_kv:
            k = _lin(blk, "wk", h, interpret).reshape(b, t, cfg.n_head_kv, d_l)
            if "wv" in blk:
                v = _lin(blk, "wv", h, interpret).reshape(
                    b, t, cfg.n_head_kv, d_l)
            else:
                v = k       # alternative attention: V = pre-norm K
            v = L.rms_norm(v, None, eps)       # weightless V norm
            k = L.rms_norm(k, blk["attn_k_norm"], eps)
            k = L.apply_rope(k, c_l, s_l, L.ROPE_TYPE_NEOX)
            # store (pad head dim up to the cache width)
            pad = d_cache - d_l
            kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else k
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else v
            upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
                c, new, (st, jnp.int32(0), jnp.int32(0))))
            kv = Gemma4Cache(
                kv.k.at[i].set(upd(kv.k[i], kp.astype(kv.k.dtype), npv)),
                kv.v.at[i].set(upd(kv.v[i], vp.astype(kv.v.dtype), npv)))
            slot = i
        else:
            # shared-KV layer: attend over the last matching-type KV slot
            # (llama-build-context.cpp:1967-1971)
            slot = n_kv - 2 if is_swa else n_kv - 1
        kc = kv.k[slot][..., :d_l]
        vc = kv.v[slot][..., :d_l]
        attn = attend(q, kc, vc, q_pos=q_pos, kv_len=kv_len,
                      scale=1.0, swa_window=window)     # raw scores
        out = _lin(blk, "wo", attn.reshape(b, t, h_l * d_l), interpret)
        out = L.rms_norm(out.astype(jnp.float32), blk["attn_post_norm"], eps)
        attn_out = x + out

        # ---- FFN ----
        if "experts" in blk:
            mlp_in = L.rms_norm(attn_out, blk["ffn_norm"], eps)
            gate = _lin(blk, "ffn_gate", mlp_in, interpret)
            up = _lin(blk, "ffn_up", mlp_in, interpret)
            mlp = _lin(blk, "ffn_down",
                       L.glu(gate.astype(jnp.float32),
                             up.astype(jnp.float32), "gelu"), interpret)
            # router on the RAW attn output normed by ffn_gate_inp_s
            r_in = L.rms_norm(attn_out, blk["ffn_gate_inp_s"], eps)
            logits = _lin(blk, "ffn_gate_inp", r_in, interpret)
            moe_in = L.rms_norm(attn_out, blk["ffn_pre_norm_2"], eps)
            moe = moe_ffn(
                moe_in.reshape(b * t, e).astype(jnp.float32),
                logits.reshape(b * t, -1).astype(jnp.float32),
                blk["experts"], cfg.n_expert_used,
                gating=GATING_SOFTMAX, norm_topk=True, activation="gelu",
                expert_out_scale=blk.get("down_exps_s"),
            ).reshape(b, t, e)
            cur = (L.rms_norm(mlp.astype(jnp.float32),
                              blk["ffn_post_norm_1"], eps)
                   + L.rms_norm(moe, blk["ffn_post_norm_2"], eps))
            cur = L.rms_norm(cur, blk["ffn_post_norm"], eps)
            cur = cur + attn_out
        else:
            h2 = L.rms_norm(attn_out, blk["ffn_norm"], eps)
            gate = _lin(blk, "ffn_gate", h2, interpret)
            up = _lin(blk, "ffn_up", h2, interpret)
            ffo = _lin(blk, "ffn_down",
                       L.glu(gate.astype(jnp.float32),
                             up.astype(jnp.float32), "gelu"), interpret)
            cur = attn_out + L.rms_norm(ffo.astype(jnp.float32),
                                        blk["ffn_post_norm"], eps)

        # ---- per-layer embedding injection ----
        if inp_per_layer is not None:
            g = _lin(blk, "pl_inp_gate", cur, interpret).astype(jnp.float32)
            g = L.gelu(g) * inp_per_layer[:, :, i]
            pl = _lin(blk, "pl_proj", g, interpret).astype(jnp.float32)
            pl = L.rms_norm(pl, blk["pl_post_norm"], eps)
            cur = cur + pl

        if "out_scale" in blk:
            cur = cur * blk["out_scale"].astype(jnp.float32)
        x = cur
        if isinstance(_.get("_trace"), list):
            _["_trace"].append((x, attn_out))

    x = L.rms_norm(x, params["output_norm"], eps)
    if return_hidden:
        return x.astype(jnp.float32), kv
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
    if cfg.final_softcap > 0:
        logits = L.softcap(logits, cfg.final_softcap)
    return logits, kv


# ---------------------------------------------------------------------------
# Gemma4 MTP / assistant draft model (build_gemma4_mtp,
# src/graphs/build_gemma4.cpp:533-905): a small Q-only transformer that
# attends INTO the target gemma4 model's KV cache (frozen — the draft never
# appends KV) and maps target hidden states to next-token logits.
#   input:  concat(target_tok_embd[ids] * sqrt(n_backbone), target_hidden)
#           @ mtp_pre_proj
#   layer i: rms/Q-proj/q-norm/rope(Q at the TARGET's freq base), FA over
#           the target cache layer matched by SWA-ness
#           (gemma4_mtp_target_kv_layer, build_gemma4.cpp:5-22), raw scores
#           (f_attention_scale = 1.0), gemma gelu-par dense FFN, out_scale
#   output: norm -> mtp_post_proj (hidden export for chained drafting) and
#           tied-embedding logits (centroid tensors optional & unused —
#           build_gemma4.cpp:886-889)
# gemma4-assistant is the same graph with `nextn.*` tensor names
# (llama-load-tensors.cpp:2290-2297).
# ---------------------------------------------------------------------------

def load_gemma4_mtp_params(gg: GGUFModel, cfg: ModelConfig, *,
                           use_quant: bool = True):
    t = gg.tensors
    assistant = cfg.arch == "gemma4-assistant"

    def tn(mtp_name, nextn_name):
        return nextn_name if assistant else mtp_name

    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "output_norm": load_dense(t["output_norm.weight"]),
        "mtp_pre_proj": load_linear(
            t[tn("mtp_pre_proj.weight", "nextn.pre_projection.weight")],
            use_quant=use_quant),
        "mtp_post_proj": load_linear(
            t[tn("mtp_post_proj.weight", "nextn.post_projection.weight")],
            use_quant=use_quant),
    }
    if "rope_freqs.weight" in t:
        params["rope_freqs"] = load_dense(t["rope_freqs.weight"])
    # kept-for-future-use tensors (not needed for inference)
    for key, nm in (("mtp_centroids",
                     tn("mtp_centroids.weight", "mtp.centroids.weight")),
                    ("mtp_token_ordering",
                     tn("mtp_token_ordering.weight",
                        "mtp.token_ordering.weight"))):
        if nm in t:
            params[key] = load_dense(t[nm])
    blocks = []
    for i in range(cfg.n_layer):
        p = f"blk.{i}."
        blk = {
            "attn_norm": load_dense(t[p + "attn_norm.weight"]),
            "wq": load_linear(t[p + "attn_q.weight"], use_quant=use_quant),
            "wo": load_linear(t[p + "attn_output.weight"],
                              use_quant=use_quant),
            "attn_q_norm": load_dense(t[p + "attn_q_norm.weight"]),
            "attn_post_norm": load_dense(t[p + "post_attention_norm.weight"]),
            "ffn_norm": load_dense(t[p + "ffn_norm.weight"]),
            "ffn_gate": load_linear(t[p + "ffn_gate.weight"],
                                    use_quant=use_quant),
            "ffn_up": load_linear(t[p + "ffn_up.weight"],
                                  use_quant=use_quant),
            "ffn_down": load_linear(t[p + "ffn_down.weight"],
                                    use_quant=use_quant),
            "ffn_post_norm": load_dense(t[p + "post_ffw_norm.weight"]),
        }
        if p + "layer_output_scale.weight" in t:
            blk["out_scale"] = load_dense(t[p + "layer_output_scale.weight"])
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def gemma4_mtp_target_kv_layer(cfg: ModelConfig, target_cfg: ModelConfig,
                               il: int) -> int:
    """Last target KV layer whose SWA-ness matches draft layer il
    (build_gemma4.cpp:5-22)."""
    is_sliding = cfg.layer_is_swa(il)
    n_kv = int((target_cfg.extra or {}).get("n_kv_layers",
                                            target_cfg.n_layer))
    for tl in reversed(range(n_kv)):
        if target_cfg.layer_is_swa(tl) == is_sliding:
            return tl
    raise ValueError("no matching target KV layer for gemma4 MTP")


def gemma4_mtp_forward(params, cfg: ModelConfig, tokens, hidden,
                       target_kv: Gemma4Cache, n_past, target_kv_len,
                       target_cfg: ModelConfig, *, target_tok_embd=None,
                       interpret: bool = False):
    """tokens (B, T) i32 draft tokens at positions n_past..n_past+T-1;
    hidden (B, T, n_backbone) f32 target hidden states per token;
    target_tok_embd: the TARGET model's embedding table (n_vocab,
    n_backbone) — the pre-projection input embeds through the target's
    table, not the draft's (build_gemma4.cpp:577 target_model.tok_embd).
    Returns (logits (B, T, V) f32, mtp_embd (B, T, n_backbone) f32)."""
    b, t = tokens.shape
    eps = cfg.rms_eps
    nb = int((cfg.extra or {}).get("mtp_backbone_n_embd", cfg.n_embd))
    d = cfg.head_dim
    h_n = cfg.n_head

    tte = params["tok_embd"] if target_tok_embd is None else target_tok_embd
    emb = tte[tokens].astype(jnp.float32) * math.sqrt(nb)
    x = jnp.concatenate([emb, hidden.astype(jnp.float32)], axis=-1)
    x = params["mtp_pre_proj"](x.astype(jnp.bfloat16),
                               interpret=interpret).astype(jnp.float32)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    kv_len = jnp.broadcast_to(jnp.asarray(target_kv_len,
                                          jnp.int32).reshape(-1), (b,))

    # rope at the TARGET's frequencies (build_gemma4.cpp:797-800)
    rope_dims = cfg.rope_dim or d
    ff = params.get("rope_freqs")
    pos_f = q_pos.astype(jnp.float32)[..., None]
    half = rope_dims // 2
    dims = jnp.arange(0, half, dtype=jnp.float32)
    theta = pos_f / (target_cfg.rope_freq_base ** (dims / half))
    if ff is not None:
        theta = theta / ff.astype(jnp.float32)[:half]
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    base_swa = target_cfg.rope_freq_base_swa or 10000.0
    cos_swa, sin_swa = L.rope_cache(q_pos, rope_dims, base_swa)

    for i, blk in enumerate(params["blocks"]):
        is_swa = cfg.layer_is_swa(i)
        window = (target_cfg.swa_window if is_swa else 0)
        c_l, s_l = (cos_swa, sin_swa) if is_swa else (cos, sin)
        tl = gemma4_mtp_target_kv_layer(cfg, target_cfg, i)

        h = L.rms_norm(x, blk["attn_norm"], eps)
        q = _lin(blk, "wq", h, interpret).reshape(b, t, h_n, d)
        q = L.rms_norm(q, blk["attn_q_norm"], eps)
        q = L.apply_rope(q, c_l, s_l, L.ROPE_TYPE_NEOX)
        kc = target_kv.k[tl][..., :d]
        vc = target_kv.v[tl][..., :d]
        attn = attend(q, kc, vc, q_pos=q_pos, kv_len=kv_len,
                      scale=1.0, swa_window=window)
        out = _lin(blk, "wo", attn.reshape(b, t, h_n * d), interpret)
        out = L.rms_norm(out.astype(jnp.float32), blk["attn_post_norm"], eps)
        attn_out = x + out

        h2 = L.rms_norm(attn_out, blk["ffn_norm"], eps)
        gate = _lin(blk, "ffn_gate", h2, interpret)
        up = _lin(blk, "ffn_up", h2, interpret)
        ffo = _lin(blk, "ffn_down",
                   L.glu(gate.astype(jnp.float32),
                         up.astype(jnp.float32), "gelu"), interpret)
        cur = attn_out + L.rms_norm(ffo.astype(jnp.float32),
                                    blk["ffn_post_norm"], eps)
        if "out_scale" in blk:
            cur = cur * blk["out_scale"].astype(jnp.float32)
        x = cur

    x = L.rms_norm(x, params["output_norm"], eps)
    mtp_embd = params["mtp_post_proj"](x.astype(jnp.bfloat16),
                                       interpret=interpret).astype(
                                           jnp.float32)
    logits = jnp.dot(x.astype(jnp.bfloat16), params["tok_embd"].T,
                     preferred_element_type=jnp.float32)
    return logits, mtp_embd
