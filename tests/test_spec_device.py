"""On-device speculative loop (Runtime._spec_loop /
generate_speculative_device): the whole draft+verify loop runs inside one
jit scan. Must be (a) lossless vs plain greedy with a perfect replay draft,
and (b) bit-identical to a host-side simulation of the device ngram-mod
drafter (same FNV hash, miss->0, insert-on-accept semantics)."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.speculative import (
    ReplayDraft, _generate_spec_greedy, _ngram_mod_prefeed, SpecStats,
    generate_speculative, generate_speculative_device)


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("sd") / "m.gguf", seed=4)
    return Runtime.from_gguf(p)


def test_device_replay_oracle_lossless(rt):
    """A perfect replay draft through the device loop must reproduce the
    greedy continuation exactly and accept ~100%."""
    prompt = "the cat sat on the mat. the cat sat on the mat. the cat"
    ids = rt.tokenizer.encode(prompt)
    # capture greedy through the same W-wide verify program (empty
    # proposal), LONGER than the generation so the replay buffer never
    # exhausts mid-chunk (exhaustion pads with always-rejected -1s, which
    # would dilute the accept rate without being a machinery failure)
    _, ref, _ = generate_speculative(rt, ids, max_new_tokens=48, n_draft=4,
                                     stage=ReplayDraft(0, []),
                                     stop_at_eos=False, capacity=256)
    _, out, stats = generate_speculative_device(
        rt, ids, max_new_tokens=24, n_draft=4, rounds_per_call=3,
        capacity=256, stop_at_eos=False, replay=ref)
    assert out == ref[:len(out)], f"device={out}\ngreedy={ref}"
    assert len(out) == 24
    assert stats.accept_rate > 0.95, stats


class _DeviceNgramSim:
    """Host drafter reproducing the DEVICE ngram-mod semantics exactly:
    FNV-1a/uint32 hash over the last n tokens, miss proposes 0, every
    emitted token inserted (the host loop's ids+out IS the emitted stream,
    so insert-at-propose-time sees the same table state as the in-scan
    insert-on-accept)."""

    def __init__(self, n=4, table_bits=16):
        self.n = n
        self.size = 1 << table_bits
        self.table = np.full((self.size,), -1, np.int32)
        self._fed = 0

    def _hash(self, win):
        h = 2166136261
        for t in win:
            h = ((h ^ int(t)) * 16777619) & 0xFFFFFFFF
        return h & (self.size - 1)

    def propose(self, tokens, n_draft):
        n = self.n
        for p in range(max(self._fed, n), len(tokens)):
            self.table[self._hash(tokens[p - n:p])] = tokens[p]
        self._fed = len(tokens)
        win = ([0] * max(0, n - len(tokens)) + list(tokens))[-n:]
        out = []
        for _ in range(n_draft):
            t = int(self.table[self._hash(win)])
            t = max(t, 0)
            out.append(t)
            win = win[1:] + [t]
        return out


def test_device_ngram_matches_host_simulation(rt):
    prompt = "a b c d. a b c d. a b c d. a b"
    ids = rt.tokenizer.encode(prompt)
    sim = _DeviceNgramSim(n=3, table_bits=12)
    _, ref, _ = _generate_spec_greedy(rt, list(ids), 24, drafter=sim,
                                      n_draft=4, capacity=256,
                                      stop_at_eos=False, stats=SpecStats())
    _, out, stats = generate_speculative_device(
        rt, ids, max_new_tokens=24, n_draft=4, rounds_per_call=2,
        capacity=256, stop_at_eos=False, ngram_n=3, table_bits=12)
    assert out == ref[:len(out)], f"device={out}\nhost-sim={ref}"
    assert stats.n_rounds > 0


def test_device_ngram_lossless_vs_plain_greedy(rt):
    """Whatever the drafter proposes, the emitted stream must equal plain
    greedy decode (lossless speculation invariant)."""
    prompt = "the cat sat on the mat. the cat sat on the mat. the cat"
    ids, ref = rt.generate(prompt, max_new_tokens=20, stop_at_eos=False)
    _, out, _ = generate_speculative_device(
        rt, prompt, max_new_tokens=20, capacity=256, stop_at_eos=False)
    assert out == ref, f"device={out}\ngreedy={ref}"


def test_prefeed_matches_sim_hash():
    toks = list(np.random.default_rng(0).integers(1, 50, 64))
    table = _ngram_mod_prefeed(toks, n=4, table_bits=10)
    sim = _DeviceNgramSim(n=4, table_bits=10)
    sim.propose(toks, 0)   # feed only
    assert np.array_equal(table, sim.table)
