"""Qwen3-Next hybrid family: delta-net recurrence + gated attention + MoE."""
import numpy as np
import pytest

from fixtures import make_tiny_qwen3next_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_qwen3next_gguf(tmp_path_factory.mktemp("q3n") / "m.gguf",
                                 seed=23)
    return Runtime.from_gguf(p)


def test_config(rt):
    cfg = rt.cfg
    assert cfg.ssm_n_group == 2 and cfg.ssm_dt_rank == 4
    assert rt.recurrent


def test_forward_finite(rt):
    ids = rt.tokenizer.encode("the quick brown fox")
    logits = rt.all_position_logits(ids)
    assert logits.shape == (len(ids), rt.cfg.n_vocab)
    assert np.all(np.isfinite(logits))


def test_chunked_matches_oneshot(rt):
    """Token-by-token recurrence + attention cache must match one-shot."""
    ids = rt.tokenizer.encode("a b c d e f")
    oneshot = rt.all_position_logits(ids)
    kv = rt.new_cache(1, 64)
    outs = []
    n_past = 0
    for tok in ids:
        logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)
        outs.append(logits[-1])
    np.testing.assert_allclose(np.stack(outs), oneshot, rtol=0.06, atol=0.06)


def test_generate(rt):
    _, out = rt.generate("hello world", max_new_tokens=5, stop_at_eos=False)
    assert len(out) == 5


def test_state_distinguishes_prefixes(rt):
    a = rt.all_position_logits(rt.tokenizer.encode("alpha beta gamma"))
    b = rt.all_position_logits(rt.tokenizer.encode("one two gamma"))
    assert np.abs(a[-1] - b[-1]).max() > 1e-4


def test_qwen35_smoke(tmp_path):
    """qwen35 loads and decodes deterministically (flat wqkv + z gate,
    separate beta/alpha, ungated attention)."""
    import numpy as np
    from fixtures import make_tiny_qwen35_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    model = make_tiny_qwen35_gguf(tmp_path / "q35.gguf", seed=60)
    rt = Runtime.from_gguf(model)
    _, out = rt.generate("Hello world", max_new_tokens=4)
    _, out2 = rt.generate("Hello world", max_new_tokens=4)
    assert out == out2
