"""Lookahead decoding + probe-path tests (examples/lookahead analogue).

The probe (positions + block_mask forward) must be bit-compatible with the
causal path, branches must be isolated, and greedy lookahead output must
equal the plain greedy decode exactly."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.lookahead import (_Layout, generate_lookahead)


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("la") / "m.gguf", seed=3)
    return Runtime.from_gguf(p)


def test_probe_causal_parity(rt):
    ids = rt.tokenizer.encode("hello world this is a test")
    kv = rt.new_cache(1, 128)
    _, kv, n_past = rt.eval_tokens(ids[:-4], kv, 0)
    ref, _, _ = rt.eval_tokens(ids[-4:], kv, n_past, all_logits=True)
    mask = np.tril(np.ones((4, 4), bool))
    pos = np.arange(n_past, n_past + 4)
    probe = rt.eval_probe(ids[-4:], pos, mask, kv, n_past)
    np.testing.assert_allclose(probe, ref, atol=2e-5)


def test_probe_branch_isolation(rt):
    ids = rt.tokenizer.encode("hello world this is a test")
    kv = rt.new_cache(1, 128)
    _, kv, n_past = rt.eval_tokens(ids, kv, 0)
    # four parallel single-token branches at the SAME position; changing one
    # branch's token must not change any other branch's logits
    mask = np.eye(4, dtype=bool)
    pos = np.full(4, n_past, np.int32)
    a = rt.eval_probe([5, 6, 7, 8], pos, mask, kv, n_past)
    b = rt.eval_probe([5, 60, 70, 80], pos, mask, kv, n_past)
    np.testing.assert_array_equal(a[0], b[0])
    assert np.abs(a[1] - b[1]).max() > 0


def test_probe_is_side_effect_free(rt):
    ids = rt.tokenizer.encode("the quick brown fox")
    kv = rt.new_cache(1, 128)
    lg0, kv, n_past = rt.eval_tokens(ids, kv, 0)
    mask = np.tril(np.ones((3, 3), bool))
    rt.eval_probe([9, 9, 9], np.arange(n_past, n_past + 3), mask, kv, n_past)
    # the committed cache still decodes identically after the probe
    lg1, _, _ = rt.eval_tokens([ids[-1]], kv, n_past - 1)
    lg2, _, _ = rt.eval_tokens([ids[-1]], kv, n_past - 1)
    np.testing.assert_array_equal(lg1, lg2)


def test_layout_mask_structure():
    lay = _Layout(W=4, N=3, G=2)
    assert lay.T == 1 + 2 * 2 + 3 + 4
    m, pos = lay.mask, lay.rel_pos
    assert pos[0] == 0 and m[0].sum() == 1            # input sees only itself
    # gram 1 token 1 sees: itself, gram 1 token 0, input
    r = 1 + 1 * 2 + 1
    assert m[r, 0] and m[r, r - 1] and m[r, r] and m[r].sum() == 3
    # level 1 col 2 sees: input, level-0 cols 1..2, itself
    r = lay.level_row(1, 2)
    l0 = 1 + 2 * 2
    assert m[r, 0] and m[r, l0] and m[r, l0 + 1] and m[r, r]
    assert not m[r, l0 + 2]      # not level-0 col 3
    assert pos[r] == 1 + 2
    # with N=4 (levels 1..2): level 2 col 0 sees its own column's level 1
    lay4 = _Layout(W=4, N=4, G=2)
    r2 = lay4.level_row(2, 0)
    assert lay4.mask[r2, lay4.level_row(1, 0)] and lay4.rel_pos[r2] == 2


def test_lookahead_matches_greedy(rt):
    prompt = "the quick brown fox jumps over the lazy dog and the quick brown fox"
    _, base = rt.generate(prompt, 24, seed=0)
    _, out, st = generate_lookahead(rt, prompt, 24, W=4, N=3, G=4, seed=0)
    assert out == base
    assert st.n_predict >= 24
    assert st.n_rounds < 24          # ngram acceptance compressed the rounds
    assert st.n_accept > 0


@pytest.mark.parametrize("prompt", [
    "once upon a time in a land far away there lived",
    "the cat sat on the mat while the dog",
    "a b c a b c a b",
])
def test_lookahead_greedy_parity_prompts(rt, prompt):
    """Position-sensitive parity: the KV commit must place `cur` at n_past
    (a one-slot shift diverges on these prompts; regression for the
    accepted-tokens-only commit bug)."""
    _, base = rt.generate(prompt, 20, seed=0)
    _, out, _ = generate_lookahead(rt, prompt, 20, W=4, N=3, G=4, seed=0)
    assert out == base


def test_lookahead_n2_window(rt):
    """N=2 degenerates to a single window level seeded from row 0 / level-0
    rows; must still match greedy exactly and not crash."""
    prompt = "alpha beta gamma alpha beta gamma alpha"
    _, base = rt.generate(prompt, 16, seed=0)
    _, out, _ = generate_lookahead(rt, prompt, 16, W=4, N=2, G=4, seed=0)
    assert out == base


def test_lookup_cache_roundtrip(tmp_path):
    from ik_llama_cpp_tpu.tools.lookup import (
        build_cache_from_tokens, load_ngram_cache, merge_ngram_caches,
        save_ngram_cache)
    toks = [1, 2, 3, 1, 2, 3, 1, 2, 4]
    cache = build_cache_from_tokens(toks)
    assert cache[(1, 2)][3] == 2 and cache[(1, 2)][4] == 1
    p = tmp_path / "c.bin"
    save_ngram_cache(cache, p)
    loaded = load_ngram_cache(str(p))
    assert loaded == cache
    merged = merge_ngram_caches(dict(loaded), cache)
    assert merged[(1, 2)][3] == 4


def test_lookup_cache_drives_spec_stage(rt, tmp_path):
    """A static cache built from a corpus accelerates the ngram-cache stage."""
    from ik_llama_cpp_tpu.runtime.speculative import (NgramCacheDraft,
                                                      generate_speculative)
    from ik_llama_cpp_tpu.tools.lookup import (build_cache_from_tokens,
                                               load_ngram_cache,
                                               save_ngram_cache)
    corpus = rt.tokenizer.encode("alpha beta gamma " * 30)
    p = tmp_path / "static.bin"
    save_ngram_cache(build_cache_from_tokens(corpus), p)
    static = load_ngram_cache(str(p))
    _, base = rt.generate("alpha beta gamma alpha beta", 12, seed=0)
    stage = NgramCacheDraft(static_cache=static)
    _, out, st = generate_speculative(rt, "alpha beta gamma alpha beta", 12,
                                      stage=stage, seed=0)
    assert out == base
