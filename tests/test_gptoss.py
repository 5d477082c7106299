"""gpt-oss (openai_moe) family tests: attention sinks, biased router,
per-expert biases, clamped swiglu_oai, alternating SWA — and cross-engine
parity vs the reference's build_openai_moe."""
import numpy as np
import pytest

from fixtures import make_tiny_gptoss_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_gptoss_gguf(tmp_path_factory.mktemp("oss") / "m.gguf", seed=12)
    return Runtime.from_gguf(p)


def test_config(rt):
    cfg = rt.cfg
    assert cfg.moe_act == "swiglu_oai"
    assert cfg.expert_gating_func == 3
    assert cfg.layer_is_swa(0) and not cfg.layer_is_swa(1)


def test_forward_and_generate(rt):
    ids = rt.tokenizer.encode("the quick brown fox")
    logits = rt.all_position_logits(ids)
    assert logits.shape == (len(ids), rt.cfg.n_vocab)
    assert np.all(np.isfinite(logits))
    _, out = rt.generate("hello", max_new_tokens=4, stop_at_eos=False)
    assert len(out) == 4


def test_sinks_change_attention(rt, tmp_path):
    """Zeroing the sink logits must change the output (they absorb mass)."""
    import jax.numpy as jnp
    ids = rt.tokenizer.encode("a b c d")
    base = rt.all_position_logits(ids)
    saved = [blk["attn_sinks"] for blk in rt.params["blocks"]]
    for blk in rt.params["blocks"]:
        blk["attn_sinks"] = blk["attn_sinks"] + 5.0   # sink absorbs much more
    rt._step_fns.clear()
    changed = rt.all_position_logits(ids)
    for blk, s in zip(rt.params["blocks"], saved):
        blk["attn_sinks"] = s
    rt._step_fns.clear()
    assert np.abs(changed - base).max() > 1e-3


def test_gptoss_logit_parity(tmp_path):
    """Cross-engine parity vs the reference's build_openai_moe (sinks,
    biased router, swiglu_oai experts, alternating SWA)."""
    import sys
    sys.path.insert(0, str((__import__("pathlib").Path(__file__).parent)))
    from test_cross_engine import needs_ref, _parity_check, ref_available, build_gen_logits
    if not (ref_available and build_gen_logits()):
        pytest.skip("reference build unavailable")
    model = make_tiny_gptoss_gguf(tmp_path / "oss.gguf", seed=12)
    _parity_check(model, "Hello world, this is a test", 0.20)


def test_gptoss_quant_kv(tmp_path):
    """gpt-oss with int8 KV cache: the fused sinks+q8 FA path must track the
    float-cache engine (was a slow dequant-everything jnp fallback)."""
    p = make_tiny_gptoss_gguf(tmp_path / "ossq.gguf", seed=12)
    rt_f = Runtime.from_gguf(p)
    rt_q = Runtime.from_gguf(p, kv_quant=True)
    ids = rt_f.tokenizer.encode("the quick brown fox jumps over")
    lf = rt_f.all_position_logits(ids)
    lq = rt_q.all_position_logits(ids)
    assert np.all(np.isfinite(lq))
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 0.9, f"argmax agreement {agree:.2%}"
