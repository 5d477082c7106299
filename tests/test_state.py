"""State save/restore: resumed session must produce identical continuations
(the analogue of examples/save-load-state)."""
import numpy as np

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.state import save_state, load_state


def test_save_load_state(tmp_path):
    p = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=8)
    rt = Runtime.from_gguf(p)
    ids = rt.tokenizer.encode("Once upon a time there was")
    kv = rt.new_cache(1, 128)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)

    state_file = tmp_path / "sess.bin"
    save_state(state_file, ids, n_past, kv)

    # continue WITHOUT reload (reference behavior)
    ref_out = []
    kv_a, np_a, lg = kv, n_past, logits
    cur = int(lg[-1].argmax())
    for _ in range(8):
        ref_out.append(cur)
        lg, kv_a, np_a = rt.eval_tokens([cur], kv_a, np_a)
        cur = int(lg[-1].argmax())

    # restore into a fresh cache and continue -> must match exactly
    kv_b = rt.new_cache(1, 128)
    toks, np_b, kv_b = load_state(state_file, kv_b)
    assert toks == ids and np_b == n_past
    out = []
    cur = int(logits[-1].argmax())
    lg = logits
    for _ in range(8):
        out.append(cur)
        lg, kv_b, np_b = rt.eval_tokens([cur], kv_b, np_b)
        cur = int(lg[-1].argmax())
    assert out == ref_out


def test_save_load_quantized_cache(tmp_path):
    p = make_tiny_llama_gguf(tmp_path / "mq.gguf", seed=8)
    rt = Runtime.from_gguf(p, kv_quant=True)
    ids = rt.tokenizer.encode("hello world")
    kv = rt.new_cache(1, 64)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
    f = tmp_path / "s.bin"
    save_state(f, ids, n_past, kv)
    kv2 = rt.new_cache(1, 64)
    toks, np2, kv2 = load_state(f, kv2)
    lg_a, _, _ = rt.eval_tokens([5], kv, n_past)
    lg_b, _, _ = rt.eval_tokens([5], kv2, np2)
    np.testing.assert_array_equal(lg_a, lg_b)
