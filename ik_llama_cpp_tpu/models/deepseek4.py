"""DeepSeek-V4 — the TPU analogue of build_deepseek4
(src/graphs/build_deepseek4.cpp) + the dsv4 runtime (src/llama-dsv4.cpp).

Architecture (per layer), reference structure:
  * hyper-connections: the residual runs as `hc` parallel streams; each
    block mixes them with a Sinkhorn-normalized matrix + sigmoid pre/post
    gates (build_hc_pre / ggml_hc_pre with eps = dsv4_hc_eps; shared with
    openPangu's mHC — models/openpangu.py helpers are reused)
  * attention: MLA-style single latent row per position that serves as BOTH
    K and V (k-only cache, llama.cpp:1242 is_dsv4_k_only): q = wq_b(rms(
    wq_a(x))), kv = rms(wkv(x)); both roped NORM-style over the first n_rot
    dims; after attention the output is INVERSE-roped at the query position
    (GGML_OP_ROPE_BACK, build_deepseek4.cpp:1226) — relative-position
    encoding through the shared K/V rows; optional per-head attention sinks
  * grouped low-rank output projection: heads -> n_groups of o_group_dim,
    per-group wo_a (o_group_dim -> o_lora_rank), then wo_b
    (build_deepseek4.cpp:1229-1249)
  * FFN: leading dense silu layers, then DeepSeek MoE (sigmoid/softmax
    gating, selection bias exp_probs_b, weight norm/scale, per-layer
    swiglu clamps) + shared experts
  * head: hc_head collapses the streams (sigmoid(affine) + eps weights),
    output_norm, lm head

Compression (CSA ratio 4 with the LID lightning indexer / HCA ratio 128,
llama-hparams.cpp dsv4_compress_ratios): each block of `ratio` positions is
pooled into ONE compressed K row by a per-feature softmax over learned gate
scores (+ absolute positional embedding rows), GGML_OP_DS4_COMP
(ggml.c:24448); attention then sees [recent raw window (n_swa) | compressed
blocks], with the indexer selecting top-k compressed blocks on CSA layers.
TPU-native simplification: instead of the reference's incremental per-step
state-row ring (DSV4_PER_STEP_MAX_STATE_ROWS, llama-dsv4.cpp:26), the
per-position compressor states/scores are cached at full capacity and the
pooled blocks are recomputed functionally each step — mathematically
identical, jit-friendly (no data-dependent control flow), and the natural
starting point for a fused Pallas pooling kernel.
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
from ..ops.moe import (GATING_SIGMOID, GATING_SOFTMAX,
                       GATING_SQRT_SOFTPLUS, moe_ffn)
from .config import ModelConfig
from .openpangu import _mhc_post, _sinkhorn_mix
from .weights import dequant_tensor, load_dense, load_linear

CSA_RATIO = 4
HCA_RATIO = 128


@jax.tree_util.register_pytree_node_class
class DS4Cache:
    """k: (L, B, S, Dh) shared K/V latent rows; comp_state / comp_score:
    (L, B, S, D*) per-position compressor states for ratio>0 layers (zeros
    elsewhere); lid_state / lid_score likewise for the indexer."""

    def __init__(self, k, comp_state=None, comp_score=None,
                 lid_state=None, lid_score=None):
        self.k = k
        self.comp_state = comp_state
        self.comp_score = comp_score
        self.lid_state = lid_state
        self.lid_score = lid_score

    def tree_flatten(self):
        return (self.k, self.comp_state, self.comp_score,
                self.lid_state, self.lid_score), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self):
        return self.k.shape[2]

    @classmethod
    def create(cls, cfg: ModelConfig, batch: int, capacity: int, **_):
        ex = cfg.extra or {}
        d = cfg.head_dim
        nl = cfg.n_layer
        k = jnp.zeros((nl, batch, capacity, d), jnp.bfloat16)
        ratios = ex.get("compress_ratios") or ()
        if any(r > 0 for r in ratios):
            # CSA (type0 overlap) states are 2*D wide; HCA (type1) D wide —
            # allocate the max and slice per layer in the forward
            has_csa = any(r == CSA_RATIO for r in ratios)
            w = 2 * d if has_csa else d
            cs = jnp.zeros((nl, batch, capacity, w), jnp.float32)
            ls_d = int(ex.get("indexer_head_size", 0))
            lid = (jnp.zeros((nl, batch, capacity, 2 * ls_d), jnp.float32)
                   if ls_d > 0 and has_csa else None)
            return cls(k, cs, jnp.zeros_like(cs), lid,
                       None if lid is None else jnp.zeros_like(lid))
        return cls(k)


def load_deepseek4_params(gg: GGUFModel, cfg: ModelConfig, *,
                          use_quant: bool = True):
    t = gg.tensors

    def lin(name, required=True):
        if name not in t:
            if required:
                raise KeyError(name)
            return None
        return load_linear(t[name], use_quant=use_quant)

    def dense(name, required=True):
        if name not in t:
            if required:
                raise KeyError(name)
            return None
        return load_dense(t[name])

    def first(fn, *names):
        for nm in names:
            v = fn(nm, required=False)
            if v is not None:
                return v
        return None

    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "output_norm": dense("output_norm.weight"),
        "output": lin("output.weight"),
        "hc_head_fn": first(lin, "hc_head_fn.weight",
                            "output_hc_fn.weight"),
        "hc_head_scale": first(dense, "hc_head_scale.weight",
                               "output_hc_scale.weight"),
        "hc_head_base": first(dense, "hc_head_base.weight",
                              "output_hc_base.weight"),
    }

    def pick(i, *stems):
        for s in stems:
            nm = f"blk.{i}.{s}.weight"
            if nm in t:
                return nm
        return f"blk.{i}.{stems[0]}.weight"

    blocks = []
    nextn = int((cfg.extra or {}).get("nextn_predict_layers", 0))
    for i in range(cfg.n_layer - nextn):
        p = f"blk.{i}."
        blk: dict[str, Any] = {
            "attn_norm": dense(p + "attn_norm.weight"),
            "wq_a": lin(p + "attn_q_a.weight"),
            "attn_q_a_norm": dense(p + "attn_q_a_norm.weight"),
            "wq_b": lin(p + "attn_q_b.weight"),
            "wkv": lin(pick(i, "attn_kv_latent", "attn_kv", "attn_kv_a_mqa")),
            "attn_kv_norm": dense(p + "attn_kv_a_norm.weight"),
            "wo_b": lin(p + "attn_output_b.weight"),
            "ffn_norm": dense(p + "ffn_norm.weight"),
        }
        # wo_a is used as a per-group batched matmul -> keep dense
        blk["wo_a"] = jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t[p + "attn_output_a.weight"])), jnp.bfloat16)
        if p + "attn_sinks.weight" in t:
            blk["attn_sinks"] = dense(p + "attn_sinks.weight")
        for nm, key in (("hc_attn_fn", "hc_attn_fn"),
                        ("hc_attn_scale", "hc_attn_scale"),
                        ("hc_attn_base", "hc_attn_base"),
                        ("hc_ffn_fn", "hc_ffn_fn"),
                        ("hc_ffn_scale", "hc_ffn_scale"),
                        ("hc_ffn_base", "hc_ffn_base")):
            if p + nm + ".weight" in t:
                blk[key] = (lin(p + nm + ".weight") if nm.endswith("fn")
                            else dense(p + nm + ".weight"))
        # CSA/HCA compressor + LID indexer (optional per layer)
        for stems, key in (
                (("attn_compress_kv", "attn_compressor_kv"), "comp_wkv"),
                (("attn_compress_gate", "attn_compressor_gate"),
                 "comp_wgate"),
                (("indexer.compress_kv", "indexer_compressor_kv"),
                 "lid_comp_wkv"),
                (("indexer.compress_gate", "indexer_compressor_gate"),
                 "lid_comp_wgate"),
                (("indexer.attn_q_b",), "indexer_q_b"),
                (("indexer.attn_k",), "indexer_k"),
                (("indexer.proj",), "indexer_proj")):
            nm = pick(i, *stems)
            if nm in t:
                blk[key] = lin(nm)
        for stems, key in (
                (("attn_compress_ape", "attn_compressor_ape"), "comp_ape"),
                (("attn_compress_norm", "attn_compressor_norm"),
                 "comp_norm"),
                (("indexer.compress_ape", "indexer_compressor_ape"),
                 "lid_comp_ape"),
                (("indexer.compress_norm", "indexer_compressor_norm"),
                 "lid_comp_norm"),
                (("indexer.k_norm",), "indexer_k_norm")):
            nm = pick(i, *stems)
            if nm in t:
                blk[key] = (jnp.asarray(np.ascontiguousarray(
                    dequant_tensor(t[nm])), jnp.float32)
                    if "ape" in key else dense(nm))
        if i < cfg.n_layer_dense_lead:
            blk["ffn_gate"] = lin(p + "ffn_gate.weight")
            blk["ffn_up"] = lin(p + "ffn_up.weight")
            blk["ffn_down"] = lin(p + "ffn_down.weight")
        else:
            blk["ffn_gate_inp"] = lin(p + "ffn_gate_inp.weight")
            if p + "exp_probs_b.bias" in t:
                blk["exp_probs_b"] = dense(p + "exp_probs_b.bias")
            from .llama import _load_experts
            blk["experts"] = _load_experts(t, p, use_quant=use_quant)
            blk["ffn_gate_shexp"] = lin(p + "ffn_gate_shexp.weight")
            blk["ffn_up_shexp"] = lin(p + "ffn_up_shexp.weight")
            blk["ffn_down_shexp"] = lin(p + "ffn_down_shexp.weight")
        blocks.append(blk)
    params["blocks"] = blocks
    return params


def _rope_tables(q_pos, n_rot: int, base: float):
    """NORM-style rope tables over the first n_rot dims."""
    return L.rope_cache(q_pos, n_rot, base)


def _rope_partial(x, cos, sin, n_rot, rope_type, inverse=False):
    """Rope the LAST n_rot dims of x (..., D), leave the rest — DSv4 sets
    the "flipped" rope flag (op_params[15] = 1, ggml.c:21071: rope_offset =
    ne0 - n_dims) on every rope in the graph, i.e. the MLA-style
    [nope | rope] head layout."""
    s = -sin if inverse else sin
    xr = L.apply_rope(x[..., -n_rot:], cos, s, rope_type)
    return jnp.concatenate([x[..., :-n_rot], xr], axis=-1)


def _hc_pre(R, fn, scale, base, eps_norm, s, iters, eps, interpret):
    """build_hc_pre (build_deepseek4.cpp:616-651): rms-normed flat streams
    -> fn -> Sinkhorn split; returns (x, h_post, comb)."""
    b, t, _, e = R.shape
    flat = R.reshape(b, t, s * e)
    normed = L.rms_norm(flat, None, eps_norm)
    mixes = fn(normed.astype(jnp.bfloat16),
               interpret=interpret).astype(jnp.float32)
    h_pre, h_post, comb = _sinkhorn_mix(mixes, scale, base, s, iters,
                                        eps=eps)
    x = jnp.einsum("bts,btse->bte", h_pre, R.astype(jnp.float32))
    return x, h_post, comb


def _hc_head(R, fn, scale, base, eps_norm, s, eps, interpret):
    """build_hc_head: sigmoid(affine(fn(rms(flat)))) + eps stream weights."""
    b, t, _, e = R.shape
    flat = R.reshape(b, t, s * e)
    normed = L.rms_norm(flat, None, eps_norm)
    mixes = fn(normed.astype(jnp.bfloat16),
               interpret=interpret).astype(jnp.float32)
    pre = jax.nn.sigmoid(mixes * scale.astype(jnp.float32)
                         + base.astype(jnp.float32)) + eps
    return jnp.einsum("bts,btse->bte", pre, R.astype(jnp.float32))


def _hadamard(x, block: int):
    """Normalized blockwise Hadamard transform over the last dim
    (iqk_hadamard / fast_ht: butterfly then * 2^(-log2(n)/2))."""
    d = x.shape[-1]
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < block:
        h = np.block([[h, h], [h, -h]])
    h = jnp.asarray(h / math.sqrt(block), jnp.float32)
    xs = x.reshape(x.shape[:-1] + (d // block, block))
    return jnp.einsum("...b,cb->...c", xs, h).reshape(x.shape)


def _hadamard_size(head_size: int) -> int:
    if head_size & (head_size - 1) == 0:
        return head_size
    for i in (512, 256, 128, 64):
        if head_size % i == 0:
            return i
    return 0


def ds4_comp_pool(state, score, ratio: int, kind: int):
    """GGML_OP_DS4_COMP (ggml.c:24448): per-feature softmax-weighted pooling
    of state rows into one compressed row per block.

    kind 1 (HCA, type1): state/score (NB, ratio, D) -> (NB, D), softmax
    over the block's rows per feature.
    kind 0 (CSA/LID, type0 "overlap"): state/score (NB, 2*ratio, 2*D)
    where rows [0, ratio) are the PREVIOUS block's (the jnp caller stacks
    them; missing rows carry score -inf) and rows [ratio, 2*ratio) the
    current block's: output feature j jointly softmax-pools the previous
    rows' feature j (low half) with the current rows' feature j+D (high
    half). Returns (NB, D)."""
    if kind == 1:
        m = score.max(axis=1, keepdims=True)
        w = jnp.exp(score - m)
        tot = w.sum(axis=1)
        res = (w * state).sum(axis=1)
        return jnp.where(tot > 0, res / jnp.where(tot > 0, tot, 1.0), 0.0)
    nb, two_r, two_d = state.shape
    r = two_r // 2
    d = two_d // 2
    vals = jnp.concatenate([state[:, :r, :d], state[:, r:, d:]], axis=1)
    scrs = jnp.concatenate([score[:, :r, :d], score[:, r:, d:]], axis=1)
    m = scrs.max(axis=1, keepdims=True)
    w = jnp.exp(scrs - m)
    tot = w.sum(axis=1)
    res = (w * vals).sum(axis=1)
    return jnp.where(tot > 0, res / jnp.where(tot > 0, tot, 1.0), 0.0)


def _compress_blocks(state, score, norm, blk_pos, ratio, kind, n_rot,
                     base, eps, rope_type, hadamard: bool = False):
    """Pool per-position (state, score) rows cached at full capacity into
    compressed K rows: (B, NB, D) from (B, S, W) with S = NB*ratio and
    W = 2D for type0 / D for type1 (see ds4_comp_pool)."""
    b, s, w_ = state.shape
    nb = s // ratio
    st = state[:, :nb * ratio].reshape(b, nb, ratio, w_)
    sc = score[:, :nb * ratio].reshape(b, nb, ratio, w_)
    if kind == 0:
        # previous block's rows (block 0 gets zero-state/-inf-score rows,
        # dsv4_append_zero_row semantics)
        st_prev = jnp.concatenate(
            [jnp.zeros_like(st[:, :1]), st[:, :-1]], axis=1)
        sc_prev = jnp.concatenate(
            [jnp.full_like(sc[:, :1], -jnp.inf), sc[:, :-1]], axis=1)
        st = jnp.concatenate([st_prev, st], axis=2)      # (B, NB, 2r, W)
        sc = jnp.concatenate([sc_prev, sc], axis=2)
    pooled = jax.vmap(lambda a, c: ds4_comp_pool(a, c, ratio, kind))(st, sc)
    pooled = L.rms_norm(pooled, norm, eps)
    cos, sin = L.rope_cache(blk_pos, n_rot, base)
    pooled = _rope_partial(pooled[:, :, None, :], cos, sin, n_rot,
                           rope_type)[:, :, 0, :]
    if hadamard:       # ds4_build_comp applies Hadamard AFTER norm+rope
        pooled = _hadamard(pooled, _hadamard_size(pooled.shape[-1]))
    return pooled


def forward(params, cfg: ModelConfig, tokens, kv: DS4Cache, n_past, *,
            interpret: bool = False, logits_last_only: bool = False,
            n_valid=None, return_hidden: bool = False, **_):
    """tokens (B, T) -> (logits, cache)."""
    ex = cfg.extra or {}
    b, t = tokens.shape
    e = cfg.n_embd
    eps = cfg.rms_eps
    hc = int(ex.get("hc_mult", 1))
    iters = int(ex.get("hc_sinkhorn_iters", 3))
    hc_eps = float(ex.get("hc_eps", eps))
    d = cfg.head_dim
    n_rot = cfg.rope_dim or d
    h_n = cfg.n_head
    ratios = tuple(ex.get("compress_ratios") or (0,) * cfg.n_layer)
    comp_base = float(ex.get("compress_rope_base", cfg.rope_freq_base))
    n_swa = cfg.swa_window
    scale = 1.0 / math.sqrt(d)
    clamps = tuple(ex.get("swiglu_limits") or ())
    clamps_sh = tuple(ex.get("swiglu_limits_shared") or clamps)

    x = params["tok_embd"][tokens].astype(jnp.float32)          # (B, T, E)
    R = jnp.broadcast_to(x[:, :, None, :], (b, t, hc, e))

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    kv_len = npv + t

    for i, blk in enumerate(params["blocks"]):
        ratio = ratios[i] if i < len(ratios) else 0
        base_l = comp_base if ratio else cfg.rope_freq_base
        cos, sin = _rope_tables(q_pos, n_rot, base_l)

        # ---- attention block (ds4_attention) ----
        if hc > 1:
            cur, h_post, comb = _hc_pre(R, blk["hc_attn_fn"],
                                        blk["hc_attn_scale"],
                                        blk["hc_attn_base"], eps, hc, iters,
                                        hc_eps, interpret)
        else:
            cur = R[:, :, 0, :]
        h = L.rms_norm(cur, blk["attn_norm"], eps)
        qr = blk["wq_a"](h.astype(jnp.bfloat16), interpret=interpret)
        qr = L.rms_norm(qr.astype(jnp.float32), blk["attn_q_a_norm"], eps)
        q = blk["wq_b"](qr.astype(jnp.bfloat16),
                        interpret=interpret).reshape(b, t, h_n, d)
        # build_rope passes norm=nullptr for q, but llm_build_norm still
        # applies a WEIGHTLESS rms_norm in that case (llama.cpp analogue:
        # per-head qk-norm without a learned weight)
        q = L.rms_norm(q.astype(jnp.float32), None, eps)
        q = _rope_partial(q, cos, sin, n_rot, cfg.rope_type)

        kvl = blk["wkv"](h.astype(jnp.bfloat16),
                         interpret=interpret).reshape(b, t, 1, d)
        kvl = L.rms_norm(kvl.astype(jnp.float32), blk["attn_kv_norm"], eps)
        kvl = _rope_partial(kvl, cos, sin, n_rot, cfg.rope_type)

        upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
            c, new, (st, jnp.int32(0))))
        kv = DS4Cache(
            kv.k.at[i].set(upd(kv.k[i], kvl[:, :, 0, :].astype(kv.k.dtype),
                               npv)),
            kv.comp_state, kv.comp_score, kv.lid_state, kv.lid_score)

        sinks = blk.get("attn_sinks")
        kcache = kv.k[i][:, :, None, :]                 # (B, S, 1, Dh)
        if ratio > 0 and kv.comp_state is not None:
            attn = _compressed_attention(blk, kv, i, q, qr, kcache, h,
                                         q_pos, kv_len, npv, ratio, n_rot,
                                         comp_base, eps, scale, sinks, cfg,
                                         interpret)
        else:
            attn = attend(q, kcache, kcache, q_pos=q_pos, kv_len=kv_len,
                          scale=scale, sinks=sinks,
                          swa_window=n_swa if n_swa > 0 else 0)
        attn = attn.astype(jnp.float32)
        # inverse rope at the query position (GGML_OP_ROPE_BACK)
        attn = _rope_partial(attn, cos, sin, n_rot, cfg.rope_type,
                             inverse=True)

        # grouped low-rank output projection
        wo_a = blk["wo_a"]                               # (R*G, gd) logical
        gd = wo_a.shape[1]
        n_groups = (h_n * d) // gd
        o_rank = wo_a.shape[0] // n_groups
        a3 = attn.reshape(b, t, n_groups, gd)
        oa = jnp.einsum("btgd,grd->btgr", a3.astype(jnp.bfloat16),
                        wo_a.reshape(n_groups, o_rank, gd),
                        preferred_element_type=jnp.float32)
        cur = blk["wo_b"](oa.reshape(b, t, n_groups * o_rank).astype(
            jnp.bfloat16), interpret=interpret).astype(jnp.float32)

        if hc > 1:
            R = _mhc_post(cur, h_post, R, comb)
        else:
            R = (R[:, :, 0, :] + cur)[:, :, None, :]

        # ---- FFN block ----
        if hc > 1:
            cur, h_post, comb = _hc_pre(R, blk["hc_ffn_fn"],
                                        blk["hc_ffn_scale"],
                                        blk["hc_ffn_base"], eps, hc, iters,
                                        hc_eps, interpret)
        else:
            cur = R[:, :, 0, :]
        h2 = L.rms_norm(cur, blk["ffn_norm"], eps)
        limit = float(clamps[i]) if i < len(clamps) else 0.0
        limit_sh = float(clamps_sh[i]) if i < len(clamps_sh) else 0.0
        if "experts" in blk:
            logits_r = blk["ffn_gate_inp"](h2.astype(jnp.bfloat16),
                                           interpret=interpret)
            gating = {2: GATING_SIGMOID,
                      4: GATING_SQRT_SOFTPLUS}.get(
                          cfg.expert_gating_func, GATING_SOFTMAX)
            moe = moe_ffn(
                h2.reshape(b * t, e).astype(jnp.float32),
                logits_r.reshape(b * t, -1).astype(jnp.float32),
                blk["experts"], cfg.n_expert_used, gating=gating,
                norm_topk=cfg.expert_weights_norm,
                scale=cfg.expert_weights_scale,
                selection_bias=blk.get("exp_probs_b"),
                activation="silu", act_limit=limit).reshape(b, t, e)
            g = blk["ffn_gate_shexp"](h2.astype(jnp.bfloat16),
                                      interpret=interpret).astype(
                                          jnp.float32)
            u = blk["ffn_up_shexp"](h2.astype(jnp.bfloat16),
                                    interpret=interpret).astype(jnp.float32)
            act = L.glu(g, u, "silu", limit=limit_sh)
            sh = blk["ffn_down_shexp"](act.astype(jnp.bfloat16),
                                       interpret=interpret).astype(
                                           jnp.float32)
            cur = moe + sh
        else:
            g = blk["ffn_gate"](h2.astype(jnp.bfloat16),
                                interpret=interpret).astype(jnp.float32)
            u = blk["ffn_up"](h2.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
            act = (g * jax.nn.sigmoid(g)) * u
            cur = blk["ffn_down"](act.astype(jnp.bfloat16),
                                  interpret=interpret).astype(jnp.float32)

        if hc > 1:
            R = _mhc_post(cur, h_post, R, comb)
        else:
            R = (R[:, :, 0, :] + cur)[:, :, None, :]

    # ---- head ----
    if hc > 1 and params.get("hc_head_fn") is not None:
        out = _hc_head(R, params["hc_head_fn"], params["hc_head_scale"],
                       params["hc_head_base"], eps, hc, hc_eps, interpret)
    else:
        out = R[:, :, 0, :]
    out = L.rms_norm(out, params["output_norm"], eps)
    if return_hidden:
        return out.astype(jnp.float32), kv
    if logits_last_only:
        out = out[:, -1:, :]
    logits = params["output"](out.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
    return logits, kv


def _compressed_attention(blk, kv, i, q, qr, kcache, h, q_pos, kv_len,
                          npv, ratio, n_rot, comp_base, eps, scale, sinks,
                          cfg, interpret):
    """CSA (ratio 4 + LID top-k) / HCA (ratio 128) attention: queries attend
    over [recent raw rows within n_swa | visible compressed block rows] in
    ONE joint softmax (build_the_attn concatenates the caches,
    build_deepseek4.cpp:1129-1168).

    Appends the per-position compressor state/score rows to their caches
    and recomputes pooled blocks functionally (module docstring)."""
    b, t = q_pos.shape
    ex = cfg.extra or {}
    s_cap = kv.k.shape[2]
    kind = 0 if ratio == CSA_RATIO else 1

    state = blk["comp_wkv"](h.astype(jnp.bfloat16),
                            interpret=interpret).astype(jnp.float32)
    score = blk["comp_wgate"](h.astype(jnp.bfloat16),
                              interpret=interpret).astype(jnp.float32)
    ape = blk["comp_ape"]                      # (ratio, W) rows by pos%ratio
    score = score + ape[q_pos % ratio]
    updf = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0))))
    w_ = state.shape[-1]
    kv.comp_state = kv.comp_state.at[i, :, :, :w_].set(
        updf(kv.comp_state[i, :, :, :w_], state, npv))
    kv.comp_score = kv.comp_score.at[i, :, :, :w_].set(
        updf(kv.comp_score[i, :, :, :w_], score, npv))

    nb = s_cap // ratio
    if nb == 0:
        # capacity below one block (HCA ratio 128 on tiny caches): the
        # reference's else-branch — raw-only attention under the SWA mask
        return attend(q, kcache, kcache, q_pos=q_pos, kv_len=kv_len,
                      scale=scale, sinks=sinks,
                      swa_window=cfg.swa_window or 0)
    blk_pos = jnp.broadcast_to(
        (jnp.arange(nb, dtype=jnp.int32) * ratio)[None, :], (b, nb))
    comp_k = _compress_blocks(kv.comp_state[i, :, :, :w_],
                              kv.comp_score[i, :, :, :w_],
                              blk["comp_norm"], blk_pos, ratio, kind, n_rot,
                              comp_base, eps, cfg.rope_type)

    n_swa = cfg.swa_window or 0
    kcat = jnp.concatenate(
        [kcache[:, :, 0, :], comp_k.astype(jnp.float32)], axis=1)
    s_total = kcat.shape[1]
    key_pos = jnp.arange(s_total, dtype=jnp.int32)
    raw_part = key_pos < s_cap
    q_pos_e = q_pos[:, :, None]
    raw_ok = (key_pos[None, None, :] <= q_pos_e) & \
        (key_pos[None, None, :] < kv_len[:, None, None])
    if n_swa > 0:
        raw_ok &= key_pos[None, None, :] > q_pos_e - n_swa
    # a compressed block is visible once complete up to the query
    # (n_visible = (pos+1)/ratio, llama-dsv4.cpp:737: block b visible iff
    # its last position <= pos); it may overlap the raw window
    blk_end = (jnp.arange(nb, dtype=jnp.int32) + 1) * ratio - 1
    comp_idx = jnp.clip(key_pos - s_cap, 0, nb - 1)
    cend = blk_end[comp_idx]
    comp_ok = (~raw_part[None, None, :]) & (cend[None, None, :] <= q_pos_e) \
        & (cend[None, None, :] < kv_len[:, None, None])
    allow = jnp.where(raw_part[None, None, :], raw_ok, comp_ok)

    top_k = int(ex.get("indexer_top_k", 0))
    if kind == 0 and "indexer_q_b" in blk and 0 < top_k < nb:
        allow = _lid_topk_allow(blk, kv, i, h, qr, q_pos, npv, allow,
                                s_cap, nb, ratio, n_rot, comp_base, eps,
                                cfg, top_k, interpret)

    h_n = q.shape[2]
    qf = q.astype(jnp.float32)
    scores = jnp.einsum("bthd,bsd->bhts", qf, kcat) * scale
    scores = jnp.where(allow[:, None, :, :], scores, -1e30)
    if sinks is not None:
        sk = sinks.astype(jnp.float32)[None, :, None, None]
        m = jnp.maximum(scores.max(axis=-1, keepdims=True), sk)
        p = jnp.exp(scores - m)
        p = p / (p.sum(axis=-1, keepdims=True) + jnp.exp(sk - m))
    else:
        p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bsd->bthd", p, kcat)
    del h_n
    return out


def _lid_topk_allow(blk, kv, i, h, qr, q_pos, npv, allow, s_cap, nb,
                    ratio, n_rot, comp_base, eps, cfg, top_k, interpret):
    """LID lightning indexer top-k over compressed blocks
    (dsv4_build_lid_top_k, build_deepseek4.cpp:788-876): per-query scores
    sum_heads relu(q_idx_h . k_idx_block) * w_h; only the top-k visible
    blocks stay in the allow mask.  q_idx comes from the Q latent (qr) via
    indexer.attn_q_b, roped at the compress base and Hadamard-rotated; the
    LID compressed keys are built by the same type0 pooling (Hadamard
    applied after norm+rope)."""
    b, t = q_pos.shape
    ex = cfg.extra or {}
    state = blk["lid_comp_wkv"](h.astype(jnp.bfloat16),
                                interpret=interpret).astype(jnp.float32)
    score = blk["lid_comp_wgate"](h.astype(jnp.bfloat16),
                                  interpret=interpret).astype(jnp.float32)
    ape = blk["lid_comp_ape"]
    score = score + ape[q_pos % ratio]
    updf = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0))))
    w_ = state.shape[-1]
    kv.lid_state = kv.lid_state.at[i, :, :, :w_].set(
        updf(kv.lid_state[i, :, :, :w_], state, npv))
    kv.lid_score = kv.lid_score.at[i, :, :, :w_].set(
        updf(kv.lid_score[i, :, :, :w_], score, npv))

    blk_pos = jnp.broadcast_to(
        (jnp.arange(nb, dtype=jnp.int32) * ratio)[None, :], (b, nb))
    lid_k = _compress_blocks(kv.lid_state[i, :, :, :w_],
                             kv.lid_score[i, :, :, :w_],
                             blk["lid_comp_norm"], blk_pos, ratio, 0, n_rot,
                             comp_base, eps, cfg.rope_type, hadamard=True)

    n_ih = int(ex.get("indexer_n_head", 1))
    dh_i = lid_k.shape[-1]
    iq = blk["indexer_q_b"](qr.astype(jnp.bfloat16),
                            interpret=interpret).astype(jnp.float32)
    iq = iq.reshape(b, t, n_ih, dh_i)
    cos, sin = L.rope_cache(q_pos, n_rot, comp_base)
    iq = _rope_partial(iq, cos, sin, n_rot, cfg.rope_type)
    iq = _hadamard(iq, _hadamard_size(dh_i))
    iw = blk["indexer_proj"](h.astype(jnp.bfloat16),
                             interpret=interpret).astype(jnp.float32)
    iw = iw.reshape(b, t, n_ih) * (1.0 / math.sqrt(dh_i * n_ih))
    kq = jnp.einsum("bthd,bnd->btnh", iq, lid_k)
    sc = (jax.nn.relu(kq) * iw[:, :, None, :]).sum(-1)     # (B, T, NB)
    comp_allow = allow[:, :, s_cap:]
    sc = jnp.where(comp_allow, sc, -jnp.inf)
    kth = jax.lax.top_k(sc, min(top_k, nb))[0][..., -1:]
    keep = comp_allow & (sc >= kth)
    return jnp.concatenate([allow[:, :, :s_cap], keep], axis=2)
