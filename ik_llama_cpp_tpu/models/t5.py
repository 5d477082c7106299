"""T5 encoder-decoder family (t5, t5encoder, flan-t5) — the TPU analogue of
build_t5_encoder / build_t5_decoder (src/graphs/build_t5.cpp).

Structure (all RMS norms, no biases, attention scale 1.0):
  encoder layer: x += attn(norm(x), rel_bias_enc);  x += ffn(norm(x))
  decoder layer: x += self_attn(norm(x), rel_bias_dec, causal KV cache)
                 x += cross_attn(norm(x), enc_out)
                 x += ffn(norm(x))
  ffn: relu-seq (t5) or gelu-par gated (flan-t5), keyed on ffn_gate presence.

Relative position bias: T5 buckets (llama_relative_position_bucket,
src/llama.cpp:5036) looked up in a (n_buckets, n_head) embedding, layer 0's
table shared by all layers; bidirectional buckets for the encoder,
unidirectional for the decoder. Cross-attention has no positional bias.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel
from ..ops import layers as L
from .config import ModelConfig
from .llama import KVCache
from .weights import dequant_tensor, load_dense, load_linear


def load_t5_params(gg: GGUFModel, cfg: ModelConfig, *, use_quant: bool = True,
                   decoder: bool = True):
    """Tensor names per llama-model.cpp:1315-1351 (enc.* / dec.* prefixes)."""
    t = gg.tensors
    params: dict[str, Any] = {
        "tok_embd": jnp.asarray(np.ascontiguousarray(
            dequant_tensor(t["token_embd.weight"])), jnp.bfloat16),
        "enc_output_norm": load_dense(t["enc.output_norm.weight"]),
    }
    out_name = "output.weight" if "output.weight" in t else "token_embd.weight"
    params["output"] = load_linear(t[out_name], use_quant=use_quant)

    def blocks(prefix, cross):
        out = []
        i = 0
        while f"{prefix}.blk.{i}.attn_norm.weight" in t:
            p = f"{prefix}.blk.{i}."
            blk = {
                "attn_norm": load_dense(t[p + "attn_norm.weight"]),
                "wq": load_linear(t[p + "attn_q.weight"], use_quant=use_quant),
                "wk": load_linear(t[p + "attn_k.weight"], use_quant=use_quant),
                "wv": load_linear(t[p + "attn_v.weight"], use_quant=use_quant),
                "wo": load_linear(t[p + "attn_o.weight"], use_quant=use_quant)
                if p + "attn_o.weight" in t else
                load_linear(t[p + "attn_output.weight"], use_quant=use_quant),
                "ffn_norm": load_dense(t[p + "ffn_norm.weight"]),
                "ffn_up": load_linear(t[p + "ffn_up.weight"], use_quant=use_quant),
                "ffn_down": load_linear(t[p + "ffn_down.weight"], use_quant=use_quant),
            }
            if p + "ffn_gate.weight" in t:   # flan-t5 gated-gelu
                blk["ffn_gate"] = load_linear(t[p + "ffn_gate.weight"], use_quant=use_quant)
            if p + "attn_rel_b.weight" in t:  # usually only layer 0
                blk["attn_rel_b"] = load_dense(t[p + "attn_rel_b.weight"])
            if cross:
                blk["cross_attn_norm"] = load_dense(t[p + "cross_attn_norm.weight"])
                blk["wq_cross"] = load_linear(t[p + "cross_attn_q.weight"], use_quant=use_quant)
                blk["wk_cross"] = load_linear(t[p + "cross_attn_k.weight"], use_quant=use_quant)
                blk["wv_cross"] = load_linear(t[p + "cross_attn_v.weight"], use_quant=use_quant)
                blk["wo_cross"] = load_linear(t[p + "cross_attn_o.weight"], use_quant=use_quant) \
                    if p + "cross_attn_o.weight" in t else \
                    load_linear(t[p + "cross_attn_output.weight"], use_quant=use_quant)
            out.append(blk)
            i += 1
        return out

    params["enc_blocks"] = blocks("enc", cross=False)
    if decoder and "dec.output_norm.weight" in t:
        params["dec_blocks"] = blocks("dec", cross=True)
        params["dec_output_norm"] = load_dense(t["dec.output_norm.weight"])
    return params


def rel_bucket(rel_pos, n_buckets: int, bidirectional: bool):
    """Vectorized llama_relative_position_bucket (llama.cpp:5036).
    rel_pos = key_pos - query_pos (x - y with x=key, y=query)."""
    max_distance = 128
    nb = n_buckets // 2 if bidirectional else n_buckets
    if bidirectional:
        base = jnp.where(rel_pos > 0, nb, 0)
        rp = jnp.abs(rel_pos)
    else:
        base = jnp.zeros_like(rel_pos)
        rp = -jnp.minimum(rel_pos, 0)
    max_exact = nb // 2
    rp_f = jnp.maximum(rp.astype(jnp.float32), 1.0)
    large = (max_exact + jnp.floor(
        jnp.log(rp_f / max_exact) * (nb - max_exact)
        / np.log(max_distance / max_exact))).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return base + jnp.where(rp < max_exact, rp, large)


def _pos_bias(rel_b, q_pos, k_pos, n_buckets: int, bidirectional: bool):
    """(H, Tq, Tk) additive attention bias from the bucket embedding
    (llm_build_pos_bias)."""
    rel = k_pos[None, :] - q_pos[:, None]              # (Tq, Tk)
    buckets = rel_bucket(rel, n_buckets, bidirectional)
    bias = rel_b[buckets]                              # (Tq, Tk, H)
    return bias.transpose(2, 0, 1)                     # (H, Tq, Tk)


def _mha(q, k, v, mask, bias=None):
    """Scale-1.0 attention (build_t5.cpp soft_max_ext(kq, mask, 1.0f))."""
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias[None]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))


def _t5_ffn(blk, h, interpret=False):
    if "ffn_gate" in blk:    # flan-t5 gelu-par
        act = L.glu(blk["ffn_gate"](h, interpret=interpret),
                    blk["ffn_up"](h, interpret=interpret), "gelu")
    else:                    # t5 relu-seq
        act = jax.nn.relu(blk["ffn_up"](h, interpret=interpret)
                          .astype(jnp.float32)).astype(jnp.bfloat16)
    return blk["ffn_down"](act.astype(jnp.bfloat16), interpret=interpret)


def encode(params, cfg: ModelConfig, tokens, *, n_valid=None,
           interpret: bool = False):
    """Encoder pass: (B, T) -> (B, T, E) f32 final-normed hidden states."""
    b, t = tokens.shape
    h_, d = cfg.n_head, cfg.head_dim
    nbk = cfg.extra.get("n_rel_attn_bkts", 32)
    x = params["tok_embd"][tokens].astype(jnp.float32)
    pos = jnp.arange(t, dtype=jnp.int32)
    if n_valid is None:
        n_valid = jnp.int32(t)
    amask = (pos < n_valid)[None, None, None, :]
    for blk in params["enc_blocks"]:
        rel_b = blk.get("attn_rel_b", params["enc_blocks"][0].get("attn_rel_b"))
        bias = _pos_bias(rel_b, pos, pos, nbk, bidirectional=True)
        h = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        q = blk["wq"](h, interpret=interpret).reshape(b, t, h_, d)
        k = blk["wk"](h, interpret=interpret).reshape(b, t, cfg.n_head_kv, d)
        v = blk["wv"](h, interpret=interpret).reshape(b, t, cfg.n_head_kv, d)
        if cfg.n_head_kv != h_:
            k = jnp.repeat(k, h_ // cfg.n_head_kv, axis=2)
            v = jnp.repeat(v, h_ // cfg.n_head_kv, axis=2)
        attn = _mha(q, k, v, amask, bias).reshape(b, t, h_ * d)
        x = x + blk["wo"](attn.astype(jnp.bfloat16), interpret=interpret).astype(jnp.float32)
        h = L.rms_norm(x, blk["ffn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        x = x + _t5_ffn(blk, h, interpret).astype(jnp.float32)
    return L.rms_norm(x, params["enc_output_norm"], cfg.rms_eps)


def forward(params, cfg: ModelConfig, tokens, kv: KVCache, n_past,
            *, enc_out, enc_n_valid=None, interpret: bool = False,
            logits_last_only: bool = False, **_):
    """Decoder step over the causal KV cache with cross-attention into
    ``enc_out`` (B, S_enc, E). Returns (logits, kv)."""
    b, t = tokens.shape
    h_, d = cfg.n_head, cfg.head_dim
    hkv = cfg.n_head_kv
    nbk = cfg.extra.get("n_rel_attn_bkts", 32)
    s_enc = enc_out.shape[1]
    x = params["tok_embd"][tokens].astype(jnp.float32)

    npv = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1), (b,))
    q_pos = npv[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    cap = kv.capacity
    key_pos = jnp.arange(cap, dtype=jnp.int32)
    if enc_n_valid is None:
        enc_n_valid = jnp.int32(s_enc)
    cmask = (jnp.arange(s_enc) < enc_n_valid)[None, None, None, :]
    enc_b = enc_out.astype(jnp.bfloat16)

    upd = jax.vmap(lambda c, new, st: jax.lax.dynamic_update_slice(
        c, new, (st, jnp.int32(0), jnp.int32(0))))
    new_k, new_v = [], []
    for i, blk in enumerate(params["dec_blocks"]):
        rel_b = blk.get("attn_rel_b", params["dec_blocks"][0].get("attn_rel_b"))
        h = L.rms_norm(x, blk["attn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        q = blk["wq"](h, interpret=interpret).reshape(b, t, h_, d)
        k = blk["wk"](h, interpret=interpret).reshape(b, t, hkv, d)
        v = blk["wv"](h, interpret=interpret).reshape(b, t, hkv, d)
        kc = upd(kv.k[i], k.astype(kv.k.dtype), npv)
        vc = upd(kv.v[i], v.astype(kv.v.dtype), npv)
        new_k.append(kc)
        new_v.append(vc)
        mask = ((key_pos[None, None, :] <= q_pos[:, :, None])
                & (key_pos[None, None, :] < (npv + t)[:, None, None]))[:, None, :, :]
        # decoder rel-bias over absolute positions (unidirectional buckets)
        bias = _pos_bias(rel_b, q_pos[0], key_pos, nbk, bidirectional=False)
        kk, vv = kc, vc
        if hkv != h_:
            kk = jnp.repeat(kk, h_ // hkv, axis=2)
            vv = jnp.repeat(vv, h_ // hkv, axis=2)
        attn = _mha(q, kk.astype(jnp.bfloat16), vv.astype(jnp.bfloat16),
                    mask, bias).reshape(b, t, h_ * d)
        x = x + blk["wo"](attn.astype(jnp.bfloat16), interpret=interpret).astype(jnp.float32)

        # cross-attention into the encoder output (no positional bias)
        h = L.rms_norm(x, blk["cross_attn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        qx = blk["wq_cross"](h, interpret=interpret).reshape(b, t, h_, d)
        kx = blk["wk_cross"](enc_b, interpret=interpret).reshape(b, s_enc, h_, d)
        vx = blk["wv_cross"](enc_b, interpret=interpret).reshape(b, s_enc, h_, d)
        attn = _mha(qx, kx, vx, cmask).reshape(b, t, h_ * d)
        x = x + blk["wo_cross"](attn.astype(jnp.bfloat16), interpret=interpret).astype(jnp.float32)

        h = L.rms_norm(x, blk["ffn_norm"], cfg.rms_eps).astype(jnp.bfloat16)
        x = x + _t5_ffn(blk, h, interpret).astype(jnp.float32)

    kv = KVCache(jnp.stack(new_k), jnp.stack(new_v))
    x = L.rms_norm(x, params["dec_output_norm"], cfg.rms_eps)
    if logits_last_only:
        x = x[:, -1:, :]
    logits = params["output"](x.astype(jnp.bfloat16), interpret=interpret).astype(jnp.float32)
    return logits, kv


def make_cache(cfg: ModelConfig, batch: int, capacity: int) -> KVCache:
    n_dec = cfg.extra.get("dec_n_layer", cfg.n_layer)
    shape = (n_dec, batch, capacity, cfg.n_head_kv, cfg.head_dim)
    return KVCache(jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16))
