"""DeepSeek-V4 (build_deepseek4.cpp + llama-dsv4.cpp): loading, the dense
hyper-connection path, the CSA/HCA compressor + LID indexer, and
cross-engine logit parity against the reference engine."""
import numpy as np
import pytest

from fixtures import make_tiny_deepseek4_gguf
from test_cross_engine import GEN_LOGITS, build_gen_logits, ref_available


def _load(path, capacity=64):
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    return Runtime.from_gguf(str(path))


def test_dense_forward_runs(tmp_path):
    import jax.numpy as jnp
    rt = _load(make_tiny_deepseek4_gguf(tmp_path / "d4.gguf"))
    assert rt.cfg.arch == "deepseek4"
    assert rt.cfg.extra["hc_mult"] == 2
    ids = [3, 7, 11, 5, 9, 2]
    kv = rt.new_cache(1, 64)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
    assert np.isfinite(np.asarray(logits)).all()
    assert n_past == len(ids)
    # decode continues incrementally
    logits2, kv, n_past = rt.eval_tokens([4], kv, n_past)
    assert np.isfinite(np.asarray(logits2)).all()


def test_incremental_matches_full_prefill(tmp_path):
    """Chunked decode must reproduce single-shot prefill logits (cache
    correctness incl. the inverse-rope attention output)."""
    rt = _load(make_tiny_deepseek4_gguf(tmp_path / "d4b.gguf", seed=3))
    ids = [3, 7, 11, 5, 9, 2, 8, 4]
    kv = rt.new_cache(1, 64)
    full, _, _ = rt.eval_tokens(ids, kv, 0, all_logits=True)
    kv2 = rt.new_cache(1, 64)
    step_logits = []
    n_past = 0
    for tok in ids:
        lg, kv2, n_past = rt.eval_tokens([tok], kv2, n_past)
        step_logits.append(np.asarray(lg[-1]))
    np.testing.assert_allclose(np.asarray(full)[-1], step_logits[-1],
                               rtol=2e-2, atol=2e-2)


def test_compressed_forward_runs(tmp_path):
    rt = _load(make_tiny_deepseek4_gguf(tmp_path / "d4c.gguf",
                                        compress=True, seed=5))
    assert rt.cfg.extra["compress_ratios"][1] == 4
    ids = [3, 7, 11, 5, 9, 2, 8, 4, 6, 10, 12, 13]
    kv = rt.new_cache(1, 64)
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
    assert np.isfinite(np.asarray(logits)).all()
    lg2, kv, n_past = rt.eval_tokens([4], kv, n_past)
    assert np.isfinite(np.asarray(lg2)).all()


@pytest.mark.skipif(not ref_available, reason="reference libllama missing")
def test_cross_engine_parity(tmp_path):
    # NOTE ratio-0-everywhere models crash the REFERENCE dsv4 runtime
    # (dsv4_validate_comp_plan "outside the batch/state ring" then SIGSEGV)
    # — real DSv4 checkpoints always carry CSA layers, so parity runs on
    # the compressor fixture; the pure-dense path is covered by our own
    # incremental-vs-prefill consistency test above.
    """Our forward vs the reference engine's logits on the same GGUF — the
    deepseek4 analogue of test_cross_engine.py (gen_logits dumps reference
    tokenization + all-position logits).  top_k=16 keeps the LID selection
    inert (every visible block kept) so the comparison is strict; active
    pruning is covered by the loose-gate test below (near-tied scores flip
    selections between engines on random weights — same caveat as
    test_glm_dsa_topk_selection_parity)."""
    from test_cross_engine import ref_logits
    if not build_gen_logits():
        pytest.skip("could not build gen_logits harness")
    path = make_tiny_deepseek4_gguf(tmp_path / "d4p.gguf", seed=7,
                                    compress=True, top_k=16)
    prompt = "hello world, this is a test of compression"
    ref_toks, _gen, ref_all = ref_logits(str(path), prompt, n_gen=0)

    rt = _load(path)
    ids = rt.tokenizer.encode(prompt)
    assert ids == list(ref_toks), (ids, ref_toks)
    kv = rt.new_cache(1, max(64, len(ids) + 8))
    ours, _, _ = rt.eval_tokens(ids, kv, 0, all_logits=True)
    ours = np.asarray(ours)

    for pos in range(len(ids)):
        a, b = ours[pos], ref_all[pos]
        cc = np.corrcoef(a, b)[0, 1]
        assert cc > 0.999, (pos, cc)
        # mixed f16/bf16 precision: a near-tied top-2 may flip argmax at
        # isolated positions even at cc>0.999 — accept top-2 containment
        if a.argmax() != b.argmax():
            top2 = np.argsort(b)[-2:]
            assert a.argmax() in top2, (pos, a.argmax(), b.argmax())


@pytest.mark.skipif(not ref_available, reason="reference libllama missing")
def test_cross_engine_parity_topk_pruning(tmp_path):
    """Active LID pruning (top_k=2 of up to 12 visible blocks): selection
    near-ties legitimately flip on random weights, so gate on mean prob-L1
    + argmax agreement rather than per-position correlation."""
    from test_cross_engine import _softmax_np, ref_logits
    if not build_gen_logits():
        pytest.skip("could not build gen_logits harness")
    path = make_tiny_deepseek4_gguf(tmp_path / "d4tk.gguf", seed=7,
                                    compress=True, top_k=2)
    prompt = "hello world, this is a test of compression"
    ref_toks, _gen, ref_all = ref_logits(str(path), prompt, n_gen=0)
    rt = _load(path)
    ids = rt.tokenizer.encode(prompt)
    kv = rt.new_cache(1, max(64, len(ids) + 8))
    ours, _, _ = rt.eval_tokens(ids, kv, 0, all_logits=True)
    ps, pr = _softmax_np(np.asarray(ours)), _softmax_np(ref_all)
    l1 = np.abs(ps - pr).sum(axis=-1)
    agree = (np.asarray(ours).argmax(-1) == ref_all.argmax(-1)).mean()
    assert l1.mean() < 0.1, f"mean L1 prob distance {l1.mean():.4f}"
    assert agree >= 0.9, f"greedy argmax agreement {agree:.2%}"
