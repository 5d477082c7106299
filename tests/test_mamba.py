"""Mamba (selective SSM) family tests: recurrence correctness, chunked vs
one-shot prefill equivalence (the recurrent analogue of KV-cache causality),
padding masking, and generation."""
import numpy as np
import pytest

from fixtures import make_tiny_mamba_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_mamba_gguf(tmp_path_factory.mktemp("mb") / "m.gguf", seed=9)
    return Runtime.from_gguf(p)


def test_config(rt):
    assert rt.cfg.arch == "mamba"
    assert rt.cfg.ssm_d_inner == 2 * rt.cfg.n_embd
    assert rt.recurrent


def test_forward_finite(rt):
    ids = rt.tokenizer.encode("the quick brown fox")
    logits = rt.all_position_logits(ids)
    assert logits.shape == (len(ids), rt.cfg.n_vocab)
    assert np.all(np.isfinite(logits))


def test_chunked_prefill_matches_oneshot(rt):
    """Feeding tokens one at a time through the recurrence must match the
    all-at-once scan (validates state carry + padding masking)."""
    ids = rt.tokenizer.encode("a b c d e f g")
    oneshot = rt.all_position_logits(ids)

    kv = rt.new_cache(1)
    outs = []
    n_past = 0
    for tok in ids:
        logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)
        outs.append(logits[-1])
    stepped = np.stack(outs)
    np.testing.assert_allclose(stepped, oneshot, rtol=0.05, atol=0.05)


def test_generate(rt):
    _, out = rt.generate("hello", max_new_tokens=5)
    assert len(out) >= 1


def test_state_distinguishes_prefixes(rt):
    """Different prefixes must give different final-state logits."""
    a = rt.all_position_logits(rt.tokenizer.encode("alpha beta gamma"))
    b = rt.all_position_logits(rt.tokenizer.encode("one two gamma"))
    assert np.abs(a[-1] - b[-1]).max() > 1e-4
