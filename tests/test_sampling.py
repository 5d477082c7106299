"""Sampler-chain unit tests — analogue of reference tests/test-sampling.cpp."""
import numpy as np
import pytest

from ik_llama_cpp_tpu.runtime.sampling import (
    SamplerParams, SamplerState, sample, apply_dry, apply_penalties)


def rng():
    return np.random.default_rng(0)


def test_greedy():
    logits = np.array([0.1, 3.0, -1.0, 2.0], np.float32)
    p = SamplerParams(temp=0.0)
    assert sample(logits, p, rng()) == 1


def test_top_k_restricts():
    logits = np.array([5.0, 4.0, 3.0, -10.0, -10.0], np.float32)
    p = SamplerParams(temp=1.0, top_k=2, top_p=1.0, min_p=0.0)
    r = rng()
    seen = {sample(logits, p, r) for _ in range(200)}
    assert seen <= {0, 1}


def test_top_p():
    logits = np.log(np.array([0.6, 0.3, 0.05, 0.05], np.float32))
    p = SamplerParams(temp=1.0, top_k=0, top_p=0.7, min_p=0.0)
    r = rng()
    seen = {sample(logits, p, r) for _ in range(300)}
    assert seen <= {0, 1}


def test_min_p():
    logits = np.log(np.array([0.5, 0.4, 0.001, 0.099], np.float32))
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.2)
    seen = {sample(logits, p, rng()) for _ in range(300)}
    assert seen <= {0, 1}


def test_logit_bias_ban_and_boost():
    logits = np.array([0.0, 5.0, 0.0], np.float32)
    p = SamplerParams(temp=0.0, logit_bias={1: -101.0, 2: 100.0})
    assert sample(logits, p, rng()) == 2


def test_repetition_penalty():
    logits = np.array([2.0, 1.9, 0.0], np.float32)
    p = SamplerParams(temp=0.0, penalty_repeat=2.0, penalty_last_n=8)
    # token 0 was produced before → halved below token 1
    assert sample(logits, p, rng(), history=[0]) == 1


def test_dry_penalizes_repeat_continuation():
    # history ...A B C A B → continuing with C extends a 2-repeat
    hist = [10, 11, 12, 10, 11]
    logits = np.zeros(20, np.float32)
    p = SamplerParams(dry_multiplier=2.0, dry_base=1.75, dry_allowed_length=2,
                      dry_penalty_last_n=64)
    out = apply_dry(logits, hist, p)
    assert out[12] < 0.0
    assert out[13] == 0.0


def test_dry_sequence_breaker_resets():
    hist = [10, 11, 99, 10, 11]     # 99 is a breaker → no match spans it
    logits = np.zeros(20, np.float32)
    p = SamplerParams(dry_multiplier=2.0, dry_allowed_length=2,
                      dry_penalty_last_n=64, dry_sequence_breaker_ids=(99,))
    out = apply_dry(logits, hist, p)
    assert np.all(out == 0.0)


def test_mirostat_v2_runs_and_adapts_mu():
    st = SamplerState()
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, mirostat=2,
                      mirostat_tau=4.0)
    r = rng()
    logits = np.linspace(3.0, -3.0, 64).astype(np.float32)
    for _ in range(50):
        tok = sample(logits, p, r, state=st)
        assert 0 <= tok < 64
    assert st.mu is not None and st.mu != 8.0   # mu moved from its 2*tau init


def test_mirostat_v1_runs():
    st = SamplerState()
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0, mirostat=1)
    r = rng()
    logits = np.linspace(3.0, -3.0, 256).astype(np.float32)
    toks = [sample(logits, p, r, state=st) for _ in range(20)]
    assert all(0 <= t < 256 for t in toks)


def test_adaptive_p_tracks_target():
    st = SamplerState()
    p = SamplerParams(temp=1.0, top_k=0, top_p=1.0, min_p=0.0,
                      adaptive_target=0.3, adaptive_decay=0.9)
    r = rng()
    logits = np.linspace(2.0, -2.0, 32).astype(np.float32)
    for _ in range(30):
        tok = sample(logits, p, r, state=st)
        assert 0 <= tok < 32
    assert st.adaptive_total_weight > 0.0


def test_sampler_order_configurable():
    # with only temperature in the chain, all tokens remain reachable
    logits = np.array([2.0, 1.0, 0.0, -1.0], np.float32)
    p = SamplerParams(temp=5.0, samplers=("temperature",))
    r = rng()
    seen = {sample(logits, p, r) for _ in range(500)}
    assert seen == {0, 1, 2, 3}


def test_dynatemp():
    logits = np.array([5.0, 1.0, 0.5, 0.2], np.float32)
    p = SamplerParams(temp=0.8, dynatemp_range=0.5, top_k=0, top_p=1.0,
                      min_p=0.0)
    tok = sample(logits, p, rng())
    assert 0 <= tok < 4


def test_return_probs():
    logits = np.array([2.0, 1.0, 0.0], np.float32)
    p = SamplerParams(temp=1.0, top_k=2, top_p=1.0, min_p=0.0)
    tok, ids, probs = sample(logits, p, rng(), return_probs=True)
    assert len(ids) == len(probs) == 2
    assert abs(probs.sum() - 1.0) < 1e-5


def test_fast_candidate_selection_matches_full_sort():
    """The partial-selection fast paths (_initial_candidates) must pick the
    same token as a full argsort across chain configurations and
    distribution shapes (llama.cpp's partial-sort top-k equivalence)."""
    import ik_llama_cpp_tpu.runtime.sampling as S

    rng0 = np.random.default_rng(7)
    flat = rng0.standard_normal(64000).astype(np.float32)
    peaked = flat.copy()
    peaked[:100] += np.linspace(12, 4, 100).astype(np.float32)

    def full_init(logits, p):
        order = np.argsort(-logits)
        lg = logits[order]
        return order, lg, S._softmax(lg)

    combos = [
        dict(temp=0.8, top_k=40, top_p=0.95, min_p=0.05, penalty_repeat=1.1),
        dict(temp=0.7, top_k=0, top_p=0.9),
        dict(temp=1.0, top_k=0, top_p=0.999),
        dict(temp=0.8, top_k=100, top_p=0.95, xtc_probability=0.5,
             xtc_threshold=0.1),
        dict(temp=0.8, top_k=0, top_p=1.0, min_p=0.1),
        dict(temp=0.8, top_k=0, top_p=1.0, tfs_z=0.95),
        dict(temp=0.8, top_k=64, dynatemp_range=0.3),
        dict(temp=0.8, top_k=40, mirostat=2),
        dict(temp=0.8, top_k=40, penalty_freq=0.2, penalty_present=0.3),
    ]
    hist = list(rng0.integers(0, 64000, 256))
    orig = S._initial_candidates
    try:
        for logits in (flat, peaked):
            for kw in combos:
                p = S.SamplerParams(**kw)
                for seed in range(3):
                    S._initial_candidates = orig
                    t1 = S.sample(logits, p, np.random.default_rng(seed),
                                  history=hist, state=S.SamplerState())
                    S._initial_candidates = full_init
                    t2 = S.sample(logits, p, np.random.default_rng(seed),
                                  history=hist, state=S.SamplerState())
                    assert t1 == t2, (kw, seed, t1, t2)
    finally:
        S._initial_candidates = orig


def test_mirostat_bypasses_sampler_queue():
    """Reference semantics: mirostat skips the truncation chain entirely
    (common/sampling.cpp builds penalties+temp+mirostat only). With top_k=1
    in params, mirostat sampling must still reach non-argmax tokens
    (regression: the chain used to truncate candidates first and apply
    temperature a second time)."""
    rng = np.random.default_rng(0)
    lg = np.zeros(64, np.float32)
    lg[7] = 1.0          # mild peak: plenty of surprise mass elsewhere
    p = SamplerParams(temp=1.0, top_k=1, top_p=0.5, min_p=0.5, mirostat=2,
                      mirostat_tau=8.0)
    st = SamplerState()
    picks = {sample(lg, p, rng, state=st) for _ in range(300)}
    assert len(picks) > 1, "mirostat was truncated by the top_k=1 chain"

    rng = np.random.default_rng(0)
    p1 = SamplerParams(temp=1.0, top_k=1, mirostat=1, mirostat_tau=8.0)
    st = SamplerState()
    picks1 = {sample(lg, p1, rng, state=st) for _ in range(300)}
    assert len(picks1) > 1


def test_sample_topk_exact_parity():
    """sample_topk fed from a host-computed top-K prefetch must reproduce
    sample() EXACTLY (token and rng consumption) for compatible chains —
    the correctness contract of the device-side top-k readback path."""
    from ik_llama_cpp_tpu.runtime.sampling import (sample_topk,
                                                   topk_chain_compatible)
    V, K = 5000, 128
    rng_data = np.random.default_rng(0)
    for trial in range(30):
        logits = rng_data.standard_normal(V).astype(np.float32) * 3.0
        history = [int(x) for x in rng_data.integers(0, V, 80)]
        for p in (
            SamplerParams(temp=0.8),
            SamplerParams(temp=0.8, penalty_repeat=1.3, penalty_freq=0.1,
                          penalty_present=0.2),
            SamplerParams(temp=0.0, penalty_repeat=1.5),
            SamplerParams(temp=1.2, top_k=20, top_p=0.8, min_p=0.1,
                          min_keep=3),
        ):
            assert topk_chain_compatible(p)
            order = np.argsort(-logits)[:K]
            vals = logits[order]
            lse = float(np.logaddexp.reduce(logits))
            r1 = np.random.default_rng(trial)
            r2 = np.random.default_rng(trial)
            t_full = sample(logits, p, r1, history=history)
            t_topk = sample_topk(vals, order, lse, p, r2, history=history)
            assert t_full == t_topk, (trial, p)


def test_topk_chain_compatible_gates():
    from ik_llama_cpp_tpu.runtime.sampling import topk_chain_compatible as ok
    assert ok(SamplerParams(temp=0.8))
    assert not ok(SamplerParams(temp=0.8, mirostat=2))
    assert not ok(SamplerParams(temp=0.8, dry_multiplier=0.5))
    assert not ok(SamplerParams(temp=0.8, logit_bias={3: 1.0}))
    assert not ok(SamplerParams(temp=0.8, top_k=0))
    assert not ok(SamplerParams(temp=0.8, xtc_probability=0.3))
    assert not ok(SamplerParams(temp=0.8, dynatemp_range=0.4))
    assert not ok(SamplerParams(temp=0.8, penalize_nl=False, nl_token_id=5))
