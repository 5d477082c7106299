"""BatchEngine feature tests: prompt-prefix cache reuse, context shift,
slot save/restore — the engine-level analogues of the reference server's
update_slots cache matching, K-shift context shift, and /slots actions."""
import queue
import time

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
from ik_llama_cpp_tpu.server.engine import BatchEngine, Request, SlotState


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    model = make_tiny_llama_gguf(tmp_path_factory.mktemp("eng") / "m.gguf", seed=2)
    rt = Runtime.from_gguf(model)
    eng = BatchEngine(rt, n_slots=2, capacity=128)
    eng.start()
    yield eng
    eng.stop()


def run_req(engine, prompt_ids, n_predict=8, ban_eos=False, timeout=120):
    q = queue.Queue()
    bias = {2: -101.0} if ban_eos else {}
    req = Request(prompt_ids=prompt_ids, n_predict=n_predict,
                  sampler=SamplerParams(temp=0.0, logit_bias=bias),
                  stream_queue=q)
    engine.submit(req)
    toks = []
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            tok, piece, done = q.get(timeout=5)
        except queue.Empty:
            continue
        if tok >= 0:
            toks.append(tok)
        if done:
            return toks
    raise TimeoutError("request did not finish")


def test_prompt_prefix_reuse(engine):
    ids = list(range(10, 40))
    out1 = run_req(engine, ids, n_predict=4)
    cached_before = engine.n_prompt_tokens_cached
    # same prompt again: common prefix should be reused
    out2 = run_req(engine, ids, n_predict=4)
    assert engine.n_prompt_tokens_cached > cached_before
    assert out1 == out2        # greedy determinism regardless of reuse


def test_prefix_reuse_divergent_suffix(engine):
    a = list(range(10, 30)) + [40, 41]
    b = list(range(10, 30)) + [50, 51]
    out_a = run_req(engine, a, n_predict=4)
    out_b = run_req(engine, b, n_predict=4)
    # fresh engine result for b must match the cached-prefix result
    eng2_out = None
    rt = engine.rt
    kv = rt.new_cache(1, 128)
    logits, kv, n_past = rt.eval_tokens(b, kv, 0)
    eng2_out = [int(np.argmax(logits[-1]))]
    assert out_b[0] == eng2_out[0]
    assert out_a != out_b or a == b


def test_context_shift_long_generation(engine):
    """Generation past the cache capacity must context-shift, not die."""
    ids = list(range(10, 25))
    toks = run_req(engine, ids, n_predict=150, ban_eos=True, timeout=300)
    assert len(toks) == 150                 # survived ≥1 shift
    shifted = [s for s in engine.slots if s.n_shifts > 0]
    assert shifted, "expected at least one context shift"


def test_slot_save_restore(engine, tmp_path):
    ids = list(range(60, 90))
    run_req(engine, ids, n_predict=4)
    # find the slot that served it
    slot = next(s for s in engine.slots if s.cache_tokens[:5] == ids[:5])
    saved = engine.save_slot(slot.idx, str(tmp_path / "slot.bin"))
    assert saved["n_saved"] == len(slot.cache_tokens)

    engine.erase_slot(slot.idx)
    assert engine.slots[slot.idx].cache_tokens == []

    restored = engine.restore_slot(slot.idx, str(tmp_path / "slot.bin"))
    assert restored["n_restored"] == saved["n_saved"]
    assert engine.slots[slot.idx].cache_tokens[:5] == ids[:5]

    # the restored KV must make prefix reuse produce identical continuations
    cached_before = engine.n_prompt_tokens_cached
    out = run_req(engine, ids, n_predict=4)
    assert engine.n_prompt_tokens_cached > cached_before
    kv = engine.rt.new_cache(1, 128)
    logits, _, _ = engine.rt.eval_tokens(ids, kv, 0)
    assert out[0] == int(np.argmax(logits[-1]))


def test_reasoning_budget_forces_close(engine):
    """With reasoning_budget=N, a runaway <think> block is force-closed by
    injecting the closing tag tokens (common/reasoning-budget.cpp)."""
    from ik_llama_cpp_tpu.server.engine import SlotState
    eng2 = BatchEngine(engine.rt, n_slots=1, capacity=64)   # not started
    q = queue.Queue()
    req_ = Request(prompt_ids=[10, 11, 12], n_predict=64,
                   sampler=SamplerParams(temp=0.0, logit_bias={2: -101.0}),
                   reasoning_budget=3, stream_queue=q)
    eng2.submit(req_)
    eng2._admit()
    slot = eng2.slots[0]
    slot.state = SlotState.GENERATING
    slot.text = "I will think. <think>"    # as if the model opened a block
    logits = np.zeros(engine.rt.cfg.n_vocab, np.float32)
    logits[40] = 5.0                       # model wants to ramble forever
    for _ in range(30):
        if slot.state != SlotState.GENERATING:
            break
        eng2._emit_token(slot, logits)
    assert "</think>" in slot.text
    # rambling stopped within budget + len("</think>" tokens) of the open
    head = slot.text.split("</think>")[0]
    assert head.count(engine.rt.tokenizer.decode([40])) <= 4


def test_streaming_multibyte_utf8(engine):
    """Emoji/CJK bytes split across byte-fallback tokens must stream without
    replacement characters."""
    tok = engine.rt.tokenizer
    # byte-fallback encode of an emoji spans 4 BYTE tokens in the tiny vocab
    ids = tok.encode("🚀🦙", add_bos=False)
    assert len(ids) >= 8
    from ik_llama_cpp_tpu.server.engine import BatchEngine, SlotState
    eng2 = BatchEngine(engine.rt, n_slots=1, capacity=64)
    q = queue.Queue()
    req_ = Request(prompt_ids=[10, 11], n_predict=len(ids),
                   sampler=SamplerParams(temp=0.0), stream_queue=q)
    eng2.submit(req_)
    eng2._admit()
    slot = eng2.slots[0]
    slot.state = SlotState.GENERATING
    # force the engine to emit exactly the emoji byte tokens
    slot.forced = list(ids)
    logits = np.zeros(engine.rt.cfg.n_vocab, np.float32)
    pieces = []
    for _ in range(len(ids)):
        eng2._emit_token(slot, logits)
        t, piece, done = q.get(timeout=5)
        pieces.append(piece)
    text = "".join(pieces)
    assert "�" not in text
    assert "🚀" in text and "🦙" in text


def test_batched_prefill_concurrent(engine):
    """Multiple requests arriving together prefill in a batched step and
    produce the same outputs as sequential evaluation."""
    import threading
    prompts = [list(range(10, 26)), list(range(100, 120)), ]
    results = [None, None]

    def go(i):
        results[i] = run_req(engine, prompts[i], n_predict=4)

    ths = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in ths: t.start()
    for t in ths: t.join(timeout=180)
    for i, p in enumerate(prompts):
        kv = engine.rt.new_cache(1, 128)
        logits, _, _ = engine.rt.eval_tokens(p, kv, 0)
        assert results[i][0] == int(np.argmax(logits[-1])), i


def test_host_prompt_cache_ram_tier(engine):
    """--cache-ram (-cram) analogue: an evicted slot's KV state is parked in
    host RAM and similarity-restored when a matching prompt returns, with
    identical greedy output and counted prefix reuse."""
    eng = BatchEngine(engine.rt, n_slots=1, capacity=128, cache_ram_mib=64)
    eng.start()
    try:
        a = list(range(10, 40))
        b = list(range(60, 90))
        out_a1 = run_req(eng, a, n_predict=4)
        # different prompt evicts A's rows into the RAM cache
        run_req(eng, b, n_predict=4)
        assert eng.prompt_cache.n_saves >= 1
        assert eng.prompt_cache.entries, "state was not parked"
        cached_before = eng.n_prompt_tokens_cached
        # A returns: restored from RAM, prefix reused, greedy-identical
        out_a2 = run_req(eng, a, n_predict=4)
        assert eng.prompt_cache.n_hits >= 1
        assert eng.n_prompt_tokens_cached > cached_before
        assert out_a1 == out_a2
        # metrics expose the RAM tier
        assert "prompt_cache_ram_hits" in eng.metrics_text()
    finally:
        eng.stop()


def test_host_prompt_cache_eviction():
    """Size-bounded: oldest entries are dropped once over the MiB limit."""
    from ik_llama_cpp_tpu.server.engine import HostPromptCache
    hpc = HostPromptCache(limit_mib=1)
    big = np.zeros((600 * 1024,), np.uint8)       # 0.6 MiB per entry
    hpc.save([1, 2, 3], {"k": big, "v": big[:0]})
    hpc.save([4, 5, 6], {"k": big.copy(), "v": big[:0]})
    assert len(hpc.entries) == 1                  # oldest evicted
    assert hpc.entries[0]["tokens"] == [4, 5, 6]
    # min reusable fraction: short overlap does not match
    e, lcp = hpc.best_match([9, 9, 9])
    assert e is None


def test_small_cache_capacity_eval(tmp_path):
    """Direct-API users can allocate capacity = prompt + n_predict without
    bucket-padded prefill writes overrunning the cache (regression), and an
    actually-full cache raises a clear error instead of an XLA TypeError."""
    import pytest as _pytest
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime

    rt = Runtime.from_gguf(make_tiny_llama_gguf(tmp_path / "s.gguf", seed=3))
    ids = rt.tokenizer.encode("the quick brown fox jumps over")
    kv = rt.new_cache(1, len(ids) + 4)          # tiny, non-bucket-aligned
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
    import numpy as np
    for _ in range(4):
        tok = int(np.argmax(logits[-1]))
        logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)
    # parity with a roomy cache
    kv2 = rt.new_cache(1, 256)
    logits2, kv2, n2 = rt.eval_tokens(ids, kv2, 0)
    np.testing.assert_allclose(
        np.asarray(logits2[-1]), np.asarray(
            rt.eval_tokens(ids, rt.new_cache(1, len(ids) + 4), 0)[0][-1]),
        atol=2e-5)
    # exhausted cache -> clear error
    with _pytest.raises(ValueError, match="KV cache full"):
        while True:
            logits, kv, n_past = rt.eval_tokens([1], kv, n_past)


def test_partial_stop_holdback_fn():
    from ik_llama_cpp_tpu.server.engine import _partial_stop_holdback as hb
    assert hb("hello wor", ["world"]) == 3       # 'wor' could start 'world'
    assert hb("hello w", ["world", "wx"]) == 1
    assert hb("hello", ["world"]) == 0
    assert hb("ab", ["abc"]) == 2
    # a FULL match is the stop check's job, not holdback's
    assert hb("abc", ["abc"]) == 0
    assert hb("x", [""]) == 0


def test_stream_never_leaks_stop_string(engine):
    """A stop string that spans token boundaries must not reach streaming
    clients; the streamed concatenation equals the trimmed final text
    (regression: pieces were streamed before the stop check)."""
    rt = engine.rt
    ids = rt.tokenizer.encode("the quick brown fox")
    # run once unconstrained to learn the greedy continuation text
    q0 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=10,
                          sampler=SamplerParams(temp=0.0), stream_queue=q0))
    text0, done = "", False
    while not done:
        _, piece, done = q0.get(timeout=60)
        text0 += piece
    if len(text0) < 4:
        pytest.skip("tiny model produced no usable text")
    # choose a stop string ending mid-way through the output
    stop = text0[2: max(4, len(text0) // 2)]
    q1 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=10,
                          sampler=SamplerParams(temp=0.0), stop=[stop],
                          stream_queue=q1))
    text1, done = "", False
    while not done:
        _, piece, done = q1.get(timeout=60)
        assert stop not in text1 + piece, "stop string leaked to stream"
        text1 += piece
    assert text1 == text0[:2]  # everything before the stop string


def test_banned_phrase_rewind(engine):
    """Banned-string rewind (server-context.cpp rewind_context): the output
    must avoid the banned text by rewinding to the match and resampling
    with the offending token banned; streamed pieces never leak it."""
    rt = engine.rt
    ids = rt.tokenizer.encode("the quick brown fox")
    q0 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=12,
                          sampler=SamplerParams(temp=0.0,
                                                logit_bias={2: -101.0}),
                          stream_queue=q0))
    base, done = "", False
    while not done:
        _, piece, done = q0.get(timeout=60)
        base += piece
    assert len(base) >= 6, base
    banned = base[3:6]
    before = engine.n_rewinds
    q1 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=12,
                          sampler=SamplerParams(temp=0.0,
                                                logit_bias={2: -101.0}),
                          banned_strings=[banned.lower()],
                          stream_queue=q1))
    text, done = "", False
    while not done:
        _, piece, done = q1.get(timeout=120)
        text += piece
        assert banned.lower() not in text.lower(), (banned, text)
    assert engine.n_rewinds > before
    assert banned.lower() not in text.lower()
    assert text != base


def test_banned_regex_rewind(engine):
    """banned_regex_ci matches case-insensitively on the held-back tail."""
    rt = engine.rt
    ids = rt.tokenizer.encode("alpha beta gamma")
    q0 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=10,
                          sampler=SamplerParams(temp=0.0,
                                                logit_bias={2: -101.0}),
                          stream_queue=q0))
    base, done = "", False
    while not done:
        _, piece, done = q0.get(timeout=60)
        base += piece
    if len(base) < 5:
        pytest.skip("no usable text")
    import re
    pat = re.escape(base[2:5])
    q1 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=10,
                          sampler=SamplerParams(temp=0.0,
                                                logit_bias={2: -101.0}),
                          banned_regex_ci=[pat.upper()],
                          stream_queue=q1))
    text, done = "", False
    while not done:
        _, piece, done = q1.get(timeout=120)
        text += piece
    assert re.search(pat, text, re.IGNORECASE) is None, (pat, text)


def _drain(q, timeout=120):
    toks, done = [], False
    deadline = time.time() + timeout
    while not done and time.time() < deadline:
        tok, piece, done = q.get(timeout=timeout)
        if tok >= 0:
            toks.append(tok)
    return toks


def test_topk_readback_decode_parity(engine):
    """The device-side top-K readback decode must produce EXACTLY the same
    tokens as the full-logits path for eligible samplers (same seed, same
    rng consumption); a dummy logit_bias forces the full path."""
    ids = list(range(30, 50))
    kwargs = dict(temp=0.9, top_k=40, top_p=0.95, min_p=0.05,
                  penalty_repeat=1.2)
    before = engine.n_topk_steps
    q1 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=12, seed=11,
                          sampler=SamplerParams(**kwargs), stream_queue=q1))
    out1 = _drain(q1)
    assert engine.n_topk_steps > before, "top-K path was not used"
    q2 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=12, seed=11,
                          sampler=SamplerParams(**kwargs,
                                                logit_bias={0: 0.0}),
                          stream_queue=q2))
    out2 = _drain(q2)
    assert out1 == out2
    # mirostat is ineligible and must keep working through the full path
    q3 = queue.Queue()
    engine.submit(Request(prompt_ids=ids, n_predict=6, seed=1,
                          sampler=SamplerParams(temp=1.0, mirostat=2),
                          stream_queue=q3))
    assert len(_drain(q3)) >= 1


def test_lazy_grammar_triggers(engine):
    """grammar_lazy: free-form generation until a trigger word appears,
    then the grammar enforces from the trigger onward. Driven manually on
    a non-started engine so the trigger timing is deterministic."""
    rt = engine.rt
    g = 'root ::= "GO" "ab"'     # trigger word then exactly "ab"
    eng2 = BatchEngine(rt, n_slots=1, capacity=64)
    q = queue.Queue()
    eng2.submit(Request(prompt_ids=[10, 11], n_predict=16,
                        sampler=SamplerParams(temp=0.0,
                                              logit_bias={2: -101.0}),
                        grammar=g, grammar_lazy=True,
                        grammar_triggers=["GO"], stream_queue=q))
    eng2._admit()
    slot = eng2.slots[0]
    slot.state = SlotState.GENERATING
    assert slot.grammar is None and slot.lazy_grammar is not None
    # free-form pre-trigger text, then the trigger
    slot.forced = rt.tokenizer.encode("xyGO", add_bos=False)
    logits = np.zeros(rt.cfg.n_vocab, np.float32)
    logits[40] = 5.0             # the model would ramble without the grammar
    while slot.forced:
        eng2._emit_token(slot, logits)
    assert slot.grammar is not None, "trigger did not activate the grammar"
    for _ in range(8):
        if slot.state != SlotState.GENERATING:
            break
        eng2._emit_token(slot, logits)
    assert "GO" in slot.text
    assert slot.text.split("GO", 1)[1].startswith("ab"), slot.text


def test_grammar_deadend_fails_request_not_engine(engine):
    """A grammar no vocab token can satisfy must fail THAT request (done
    with no output) while the engine keeps serving others."""
    rt = engine.rt
    q = queue.Queue()
    engine.submit(Request(prompt_ids=[10, 11, 12], n_predict=4,
                          sampler=SamplerParams(temp=0.0),
                          grammar='root ::= "\\uffff"', stream_queue=q))
    tok, piece, done = q.get(timeout=120)
    assert done
    # engine still alive and serving
    out = run_req(engine, list(range(20, 36)), n_predict=3)
    assert len(out) == 3
