"""K-shift context shifting (build_k_shift / llama_kv_cache_seq_add
analogue): moving cached rows + delta re-rotation must reproduce the
logits of a fresh prefill over the kept tokens."""
import numpy as np
import pytest

import jax.numpy as jnp

from fixtures import make_tiny_llama_gguf, make_tiny_gemma_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.kshift import can_shift, k_shift


def test_kshift_matches_fresh_prefill(tmp_path):
    """Single-layer model: layer-0 K/V rows are context-free functions of
    their token, so a K-shifted cache must match a fresh prefill of the
    kept tokens exactly (deeper layers intentionally keep the ORIGINAL
    context's hidden states — that is the semantic of the reference's
    K-shift too, not a re-prefill)."""
    p = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=7, n_layer=1)
    rt = Runtime.from_gguf(p)
    assert can_shift(rt.cfg)
    ids = list(np.random.default_rng(0).integers(10, 250, 24))

    kv = rt.new_cache(1, 64)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)

    n_keep, n_discard = 4, 8
    kv2, n_past2 = k_shift(kv, rt.cfg, n_keep, n_discard, jnp.int32(n_past))
    kept = ids[:n_keep] + ids[n_keep + n_discard:]
    assert int(n_past2) == len(kept)

    # continue decoding from the shifted cache vs a fresh prefill of `kept`
    nxt = [251, 252, 253]
    l_shift, kv2, np2 = rt.eval_tokens(nxt, kv2, int(n_past2))

    kvf = rt.new_cache(1, 64)
    _, kvf, npf = rt.eval_tokens(kept, kvf, 0)
    l_fresh, kvf, _ = rt.eval_tokens(nxt, kvf, npf)

    np.testing.assert_allclose(np.asarray(l_shift), np.asarray(l_fresh),
                               rtol=5e-2, atol=5e-2)


def test_kshift_identity():
    """n_discard=0 with full keep must be an exact no-op."""
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.models.llama import KVCache
    from ik_llama_cpp_tpu.models.config import ModelConfig
    cfg = ModelConfig(arch="llama", n_layer=2, n_embd=8, n_head=2,
                      n_head_kv=2, n_ff=8, n_vocab=16, n_ctx_train=64,
                      head_dim=4, rope_type=0)
    rng = np.random.default_rng(0)
    kv = KVCache(jnp.asarray(rng.standard_normal((2, 1, 8, 2, 4)),
                             jnp.float32),
                 jnp.asarray(rng.standard_normal((2, 1, 8, 2, 4)),
                             jnp.float32))
    out, np2 = k_shift(kv, cfg, 4, 0, jnp.int32(6))
    np.testing.assert_allclose(np.asarray(out.k), np.asarray(kv.k),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.v), np.asarray(kv.v))
    assert int(np2) == 6


def test_kshift_quantized_cache(tmp_path):
    p = make_tiny_llama_gguf(tmp_path / "mq.gguf", seed=7, n_layer=1)
    rt = Runtime.from_gguf(p, kv_quant=True)
    ids = list(np.random.default_rng(1).integers(10, 250, 20))
    kv = rt.new_cache(1, 64)
    _, kv, n_past = rt.eval_tokens(ids, kv, 0)
    kv2, n_past2 = k_shift(kv, rt.cfg, 4, 6, jnp.int32(n_past))
    kept = ids[:4] + ids[10:]
    l_shift, _, _ = rt.eval_tokens([251], kv2, int(n_past2))
    kvf = rt.new_cache(1, 64)
    _, kvf, npf = rt.eval_tokens(kept, kvf, 0)
    l_fresh, _, _ = rt.eval_tokens([251], kvf, npf)
    # int8 re-quantization adds one extra rounding on the shifted rows
    np.testing.assert_allclose(np.asarray(l_shift), np.asarray(l_fresh),
                               rtol=8e-2, atol=8e-2)


def test_can_shift_gates():
    from ik_llama_cpp_tpu.models.config import ModelConfig
    base = dict(arch="llama", n_layer=1, n_embd=8, n_head=2, n_head_kv=2,
                n_ff=8, n_vocab=16, n_ctx_train=64, head_dim=4)
    assert can_shift(ModelConfig(**base))
    assert not can_shift(ModelConfig(**{**base, "alibi_max_bias": 8.0}))
    assert not can_shift(ModelConfig(**{**base, "n_lora_kv": 8}))
    assert not can_shift(ModelConfig(**{**base, "arch": "mamba"}))
