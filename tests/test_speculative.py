"""Speculative decoding must produce IDENTICAL tokens to plain greedy decode
(lossless speculation invariant), with accepted drafts > 0 on repetitive text."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.speculative import generate_speculative, NgramDraft


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("s") / "m.gguf", seed=4)
    return Runtime.from_gguf(p)


def test_ngram_spec_lossless(rt):
    prompt = "abc abc abc abc abc"
    ids, ref = rt.generate(prompt, max_new_tokens=24, stop_at_eos=False)
    ids2, out, stats = generate_speculative(rt, prompt, max_new_tokens=24,
                                            stop_at_eos=False)
    assert ids2 == ids
    assert out == ref, f"spec={out}\ngreedy={ref}"
    assert stats.n_rounds > 0


def test_draft_model_spec_lossless(rt):
    # same model as its own draft -> 100% acceptance, still must be lossless
    prompt = "the quick brown"
    ids, ref = rt.generate(prompt, max_new_tokens=16, stop_at_eos=False)
    _, out, stats = generate_speculative(rt, prompt, max_new_tokens=16,
                                         draft=rt, n_draft=4, stop_at_eos=False)
    assert out == ref
    assert stats.accept_rate > 0.9, stats  # self-draft should accept ~all


def test_ngram_proposer():
    ng = NgramDraft(n_min=2)
    toks = [1, 2, 3, 4, 1, 2]
    assert ng.propose(toks, 2) == [3, 4]
    assert ng.propose([1, 2, 3], 2) == []


def test_ngram_map_draft_proposes_frequent():
    from ik_llama_cpp_tpu.runtime.speculative import NgramMapDraft
    d = NgramMapDraft(n=2)
    # "1 2 3" seen twice, "1 2 9" once -> after (1, 2) propose 3
    seq = [1, 2, 3, 5, 1, 2, 3, 5, 1, 2, 9, 5, 1, 2]
    prop = d.propose(seq, 2)
    assert prop[:1] == [3]


def test_ngram_map_stage_end_to_end(rt):
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative
    prompt = "the cat sat on the mat. the cat sat on the mat. the cat"
    _, out, stats = generate_speculative(rt, prompt, 24, stage="ngram-map",
                                         stop_at_eos=False)
    assert len(out) == 24
    # greedy equivalence with plain decode
    _, ref = rt.generate(prompt, max_new_tokens=24, stop_at_eos=False)
    assert out == ref


def test_autotune(rt):
    from ik_llama_cpp_tpu.runtime.speculative import autotune_n_draft
    best, res = autotune_n_draft(rt, "a b c a b c a b", candidates=(2, 4),
                                 n_tokens=8)
    assert best in (2, 4) and len(res) == 2


def test_suffix_draft_longest_match():
    from ik_llama_cpp_tpu.runtime.speculative import SuffixDraft
    d = SuffixDraft()
    #      0  1  2  3  4  5  6  7  8  9  10 11
    seq = [1, 2, 3, 9, 5, 1, 2, 3, 7, 1, 2, 3]
    # suffix [1,2,3] matches at j=7 (len 3) better than j=2
    prop = d.propose(seq, 2)
    assert prop == [7, 1]      # continuation after position 7's match


def test_suffix_stage_end_to_end(rt):
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative
    prompt = "one two three four. one two three four. one two three"
    _, out, stats = generate_speculative(rt, prompt, 20, stage="suffix",
                                         stop_at_eos=False)
    _, ref = rt.generate(prompt, max_new_tokens=20, stop_at_eos=False)
    assert out == ref
    assert stats.n_draft > 0


def test_mtp_stage_matches_plain_greedy(tmp_path):
    """In-graph MTP (nextn) speculation: identical greedy output to the
    plain decode, with the MTP layer loaded and drafting."""
    import sys
    from fixtures import make_tiny_moe2_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative

    path = make_tiny_moe2_gguf(tmp_path / "mtp.gguf", arch="glm4moe", seed=7,
                               nextn=1)
    rt = Runtime.from_gguf(path)
    assert rt.has_mtp
    prompt = "one two three one two three"
    p_ids, plain = rt.generate(prompt, max_new_tokens=16, stop_at_eos=False)
    _, spec, stats = generate_speculative(rt, prompt, 16, stage="mtp",
                                          n_draft=3, stop_at_eos=False)
    assert spec == plain, (spec, plain)
    assert stats.n_draft > 0


def test_speculative_recurrent_state_checkpoint(tmp_path):
    """SSM models cannot positionally rewind their recurrent state after a
    rejected draft; the verify loop must restore the pre-verify checkpoint
    and replay the accepted prefix. Greedy spec output must match plain
    greedy generation exactly."""
    from fixtures import make_tiny_mamba_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative
    p = make_tiny_mamba_gguf(tmp_path / "m.gguf", seed=5)
    rt = Runtime.from_gguf(p)
    assert rt.recurrent
    prompt = [5, 9, 12, 30, 41]
    _, plain = rt.generate(prompt, max_new_tokens=16)
    _, spec, stats = generate_speculative(rt, prompt, 16, stage="ngram",
                                          n_draft=4, stop_at_eos=False)
    assert spec[:len(plain)] == plain[:len(spec)]


def test_ngram_mod_draft_semantics():
    """ngram_mod (common/ngram-mod.cpp): modular-hash table proposes the
    recorded continuation; unseen contexts under n_min yield nothing."""
    from ik_llama_cpp_tpu.runtime.speculative import NgramModDraft
    d = NgramModDraft(n=2, size=256, n_min=1)
    seq = [1, 2, 3, 1, 2, 3, 1, 2, 3, 1, 2]
    d.begin(seq)
    out = d.propose(seq, 4)
    assert out[:2] == [3, 1]
    # low-acceptance streak resets the table (speculative.cpp:860-868)
    for _ in range(3):
        d.propose(seq, 4)
        d.accept(0)
    assert d.used == 0
    assert d.propose(seq, 4) == []  # table empty and i_last reset


def test_ngram_mod_occupancy_reset():
    from ik_llama_cpp_tpu.runtime.speculative import NgramModDraft
    d = NgramModDraft(n=2, size=8)
    d.begin(list(range(40)))    # fills >25% of 8 entries -> reset
    assert d.used == 0


def test_ngram_cache_draft_tiers():
    """ngram_cache: context cache drafts under strict thresholds; the
    static cache validates and falls back (ngram-cache.cpp:60-140)."""
    from ik_llama_cpp_tpu.runtime.speculative import NgramCacheDraft
    # strong repetition -> context cache proposes
    d = NgramCacheDraft()
    seq = [7, 8, 9] * 8
    out = d.propose(seq, 3)
    assert out == [7, 8, 9] or out[:1] == [7]
    # static-only fallback: majority continuation of the last 2-gram
    static = {(5, 6): {11: 10}}
    d2 = NgramCacheDraft(static_cache=static)
    out2 = d2.propose([1, 2, 5, 6], 1)
    assert out2 == [11]


def test_eagle3_stage_is_reference_faithful_stub():
    """The reference's eagle3 draft() is literally 'TODO: implement'
    (common/speculative.cpp:680): stage selectable, no proposals."""
    from ik_llama_cpp_tpu.runtime.speculative import Eagle3Draft
    assert Eagle3Draft().propose([1, 2, 3], 8) == []


def test_ngram_mod_stage_end_to_end(rt):
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative
    prompt = "the cat sat on the mat the cat sat on the"
    _, plain = rt.generate(prompt, max_new_tokens=12)
    _, spec, stats = generate_speculative(rt, prompt, 12, stage="ngram-mod",
                                          n_draft=4, stop_at_eos=False)
    assert spec[:len(plain)] == plain[:len(spec)]


def test_ngram_cache_stage_end_to_end(rt):
    from ik_llama_cpp_tpu.runtime.speculative import generate_speculative
    prompt = "the cat sat on the mat the cat sat on the"
    _, plain = rt.generate(prompt, max_new_tokens=12)
    _, spec, stats = generate_speculative(rt, prompt, 12,
                                          stage="ngram-cache",
                                          n_draft=4, stop_at_eos=False)
    assert spec[:len(plain)] == plain[:len(spec)]
