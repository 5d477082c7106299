"""iq4_nl KV codec + K/V Hadamard rotation — the reference FA cache-type
tail (iqk_flash_attn.cpp:121-149 IQ4_NL K/V behind GGML_IQK_FA_ALL_QUANTS)
and -khad/-vhad (ggml-cuda/hadamard.cu, GGML_OP_HADAMARD)."""
import numpy as np
import jax
import jax.numpy as jnp

from ik_llama_cpp_tpu.ops.attention import attend
from ik_llama_cpp_tpu.ops.kv_quant import (
    IQ4NL_VALUES, lut16_select, quantize_kv_rows_nl4, dequantize_kv_nl4,
    quantize_kv_rows_q4, dequantize_kv_q4, kv_codec_of,
    hadamard_matrix, hadamard_rotate, KV_ENCODERS, KV_DECODERS)


def make(b, t, s, h, hkv, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
    return q, k, v


def test_lut16_select_matches_take():
    rng = np.random.default_rng(3)
    codes = jnp.asarray(rng.integers(0, 16, (7, 33)), jnp.int32)
    got = np.asarray(lut16_select(codes))
    want = np.asarray(IQ4NL_VALUES, np.float32)[np.asarray(codes)]
    np.testing.assert_array_equal(got, want)


def test_kv_nl4_codec_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 64)), jnp.float32)
    q, s = quantize_kv_rows_nl4(x)
    assert q.shape == (2, 5, 3, 32) and q.dtype == jnp.int8
    assert kv_codec_of(q, 64) == "nl4"
    back = dequantize_kv_nl4(q, s)
    # dequant = lut[code] * scale with |scale| = amax/127. Interior error
    # <= half the widest gap (12 units); the asymmetric grid tops at +113,
    # so positive values near +127*|scale| can err up to 14 units — the
    # codec's true worst case (same asymmetry as the reference's IQ4_NL).
    err = np.abs(np.asarray(back - x))
    bound = np.abs(np.asarray(s))[..., None] * 14.0 + 1e-6
    assert (err <= bound).all()
    # the non-uniform grid must beat uniform q4 on gaussian data
    q4, s4 = quantize_kv_rows_q4(x)
    err4 = np.abs(np.asarray(dequantize_kv_q4(q4, s4) - x)).mean()
    assert err.mean() < err4.mean(), (err.mean(), err4.mean())


def test_kv_nl4_exact_at_lut_points():
    # rows built from LUT values round-trip bit-exactly
    vals = np.asarray(IQ4NL_VALUES, np.float32)
    x = jnp.asarray(np.tile(vals, 4)[None, None, None, :], jnp.float32)
    q, s = quantize_kv_rows_nl4(x)
    np.testing.assert_allclose(np.asarray(dequantize_kv_nl4(q, s)),
                               np.asarray(x), rtol=1e-6)


def test_codec_registry_dispatch():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 2, 64)), jnp.float32)
    for name in ("q8", "q4", "q6", "nl4"):
        q, s = KV_ENCODERS[name](x)
        assert kv_codec_of(q, 64) == name
        back = KV_DECODERS[name](q, s)
        assert back.shape == x.shape


def test_fa_decode_nl4_matches_oracle():
    """nl4 KV decode kernel vs the dequantize-then-attend oracle."""
    from ik_llama_cpp_tpu.ops.flash_attention import flash_attention_decode_q8
    b, t, s, h, hkv, d = 1, 2, 256, 8, 2, 128
    q, k, v = make(b, t, s, h, hkv, d, seed=15)
    kq, ks = quantize_kv_rows_nl4(k)
    vq, vs = quantize_kv_rows_nl4(v)
    n_past = 100
    kv_len = jnp.full((b,), n_past + t, jnp.int32)
    npv = jnp.full((b,), n_past, jnp.int32)
    q_pos = n_past + jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, 0)
    scale = 1.0 / np.sqrt(d)
    ref = attend(q, dequantize_kv_nl4(kq, ks), dequantize_kv_nl4(vq, vs),
                 q_pos=q_pos, kv_len=kv_len, scale=scale)
    got = flash_attention_decode_q8(q, kq, ks, vq, vs, npv, kv_len,
                                    scale=scale, block_kv=128,
                                    interpret=True)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_nl4_kv_cache_end_to_end():
    """-ctk/-ctv iq4_nl: non-linear 4-bit KV cache tracks the bf16 engine."""
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    p = make_tiny_llama_gguf("/tmp/kvnl4_tiny.gguf", seed=7, n_embd=128,
                             n_head=4, n_head_kv=2, n_ff=256)
    rt_f = Runtime.from_gguf(p)
    rt_q = Runtime.from_gguf(p, kv_quant="iq4_nl")
    kv = rt_q.new_cache(1, 64)
    assert kv.k.dtype == jnp.int8 and kv.k.shape[-1] == 16
    ids = list(range(10, 34))
    lf = rt_f.all_position_logits(ids)
    lq = rt_q.all_position_logits(ids)
    assert np.all(np.isfinite(lq))
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 0.7, f"argmax agreement {agree:.2%}"
    c = np.corrcoef(lf.ravel(), np.asarray(lq).ravel())[0, 1]
    assert c > 0.97, f"logit correlation {c:.4f}"


def test_mixed_cache_nl4_mid():
    """Per-layer overrides with an nl4 bulk + q8 first/last layers."""
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    p = make_tiny_llama_gguf("/tmp/kvnl4_mix.gguf", seed=7, n_embd=128,
                             n_head=4, n_head_kv=2, n_ff=256)
    rt = Runtime.from_gguf(p, kv_quant={"type": "nl4", "first": "q8",
                                        "n_first": 1, "last": "q8",
                                        "n_last": 1})
    ids = list(range(10, 30))
    lq = rt.all_position_logits(ids)
    assert np.all(np.isfinite(lq))
    rt_f = Runtime.from_gguf(p)
    lf = rt_f.all_position_logits(ids)
    c = np.corrcoef(lf.ravel(), np.asarray(lq).ravel())[0, 1]
    assert c > 0.97, f"logit correlation {c:.4f}"


# ---------------------------------------------------------------------------
# Hadamard
# ---------------------------------------------------------------------------

def test_hadamard_matrix_orthogonal_involution():
    for d in (2, 64, 128):
        hm = np.asarray(hadamard_matrix(d))
        np.testing.assert_allclose(hm @ hm.T, np.eye(d), atol=1e-5)
        np.testing.assert_allclose(hm, hm.T, atol=0)      # symmetric
        # involution: rotate twice = identity
        x = np.random.default_rng(d).standard_normal((3, d)).astype(np.float32)
        np.testing.assert_allclose(x @ hm @ hm, x, atol=1e-4)


def test_hadamard_preserves_attention_scores():
    # Hq . Hk == q . k: attention over rotated K with rotated q is exact
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((9, 128)), jnp.float32)
    s0 = np.asarray(q @ k.T)
    s1 = np.asarray(hadamard_rotate(q) @ hadamard_rotate(k).T)
    np.testing.assert_allclose(s1, s0, atol=1e-3)


def test_hadamard_tames_outliers_for_nl4():
    # a few huge channels wreck the absmax row scale; rotation spreads them
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 8, 2, 128)).astype(np.float32)
    x[..., :3] *= 40.0                              # channel outliers
    x = jnp.asarray(x)
    q0, s0 = quantize_kv_rows_nl4(x)
    err_plain = np.abs(np.asarray(dequantize_kv_nl4(q0, s0) - x)).mean()
    xr = hadamard_rotate(x)
    q1, s1 = quantize_kv_rows_nl4(xr)
    back = hadamard_rotate(dequantize_kv_nl4(q1, s1))  # un-rotate
    err_had = np.abs(np.asarray(back - x)).mean()
    assert err_had < err_plain / 2, (err_had, err_plain)


def test_khad_vhad_end_to_end_exact_on_bf16_cache():
    """With an UNquantized cache the rotation is pure math: logits match."""
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    p = make_tiny_llama_gguf("/tmp/kvhad_tiny.gguf", seed=7, n_embd=128,
                             n_head=4, n_head_kv=2, n_ff=256)
    rt0 = Runtime.from_gguf(p)
    rt1 = Runtime.from_gguf(p, k_hadamard=True, v_hadamard=True)
    assert rt1.cfg.k_hadamard and rt1.cfg.v_hadamard
    ids = list(range(10, 30))
    l0 = rt0.all_position_logits(ids)
    l1 = rt1.all_position_logits(ids)
    c = np.corrcoef(l0.ravel(), np.asarray(l1).ravel())[0, 1]
    assert c > 0.999, f"logit correlation {c:.5f}"
    agree = (l0.argmax(-1) == l1.argmax(-1)).mean()
    assert agree > 0.95, f"argmax agreement {agree:.2%}"


def test_khad_vhad_with_quantized_cache():
    """-khad -vhad -ctk q4: rotated quantized cache still tracks bf16."""
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    p = make_tiny_llama_gguf("/tmp/kvhadq_tiny.gguf", seed=7, n_embd=128,
                             n_head=4, n_head_kv=2, n_ff=256)
    rt_f = Runtime.from_gguf(p)
    rt_q = Runtime.from_gguf(p, kv_quant="q4", k_hadamard=True,
                             v_hadamard=True)
    ids = list(range(10, 30))
    lf = rt_f.all_position_logits(ids)
    lq = rt_q.all_position_logits(ids)
    assert np.all(np.isfinite(lq))
    c = np.corrcoef(lf.ravel(), np.asarray(lq).ravel())[0, 1]
    assert c > 0.97, f"logit correlation {c:.4f}"


def test_khad_disables_kshift():
    from ik_llama_cpp_tpu.runtime.kshift import can_shift
    from ik_llama_cpp_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", n_layer=2, n_embd=64, n_head=2,
                      n_head_kv=2, n_ff=128, n_vocab=100,
                      n_ctx_train=512, head_dim=32)
    assert can_shift(cfg)
    import dataclasses
    assert not can_shift(dataclasses.replace(cfg, k_hadamard=True))


def test_kshift_packed_codec_requant():
    """kshift on a q4/q6/nl4 cache must dequant -> rotate -> requant with
    the SAME codec (the old path scaled raw packed bytes — silent garbage).
    """
    from ik_llama_cpp_tpu.runtime.kshift import k_shift
    from ik_llama_cpp_tpu.models.llama import KVCache
    from ik_llama_cpp_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", n_layer=1, n_embd=256, n_head=2,
                      n_head_kv=2, n_ff=128, n_vocab=100,
                      n_ctx_train=512, head_dim=128)
    assert cfg.head_dim == 128
    rng = np.random.default_rng(2)
    for codec in ("q4", "q6", "nl4"):
        kv = KVCache.create(cfg, 1, 16, quant=codec)
        # fill 8 rows with real values through the codec
        x = jnp.asarray(rng.standard_normal((1, 8, 2, 128)), jnp.float32)
        kq, ks = KV_ENCODERS[codec](x)
        kv = KVCache(kv.k.at[0, :, :8].set(kq), kv.v.at[0, :, :8].set(kq),
                     kv.k_scale.at[0, :, :8].set(ks),
                     kv.v_scale.at[0, :, :8].set(ks))
        out, n_past = k_shift(kv, cfg, n_keep=2, n_discard=2, n_past=8)
        assert n_past == 6
        assert out.k.dtype == kv.k.dtype and out.k.shape == kv.k.shape
        # kept head rows are untouched bytes
        np.testing.assert_array_equal(np.asarray(out.k[0, :, :2]),
                                      np.asarray(kv.k[0, :, :2]))
        # moved rows decode to finite, same-magnitude values
        dec = KV_DECODERS[codec](out.k[0, :, 2:6], out.k_scale[0, :, 2:6])
        ref = KV_DECODERS[codec](kv.k[0, :, 4:8], kv.k_scale[0, :, 4:8])
        assert np.isfinite(np.asarray(dec)).all()
        # rope rotation preserves per-row norms (up to requant error)
        n_dec = np.linalg.norm(np.asarray(dec), axis=-1)
        n_ref = np.linalg.norm(np.asarray(ref), axis=-1)
        np.testing.assert_allclose(n_dec, n_ref, rtol=0.2)
