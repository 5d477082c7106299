"""Expiring logit bias tests — reference --expiring-logit-bias-file
(PR #1731: common/common.cpp:5456 parser, server-context.cpp:1880-1999
state build, common/sampling.cpp:836-995 apply/accept)."""
import queue
import time

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.expiring_bias import (ElbRuntime,
                                                    build_elb_runtime,
                                                    build_elb_states,
                                                    parse_elb)
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
from ik_llama_cpp_tpu.server.engine import BatchEngine, Request


# ------------------------------------------------------------------ parser


def test_parse_basic_entry():
    params = parse_elb('# comment\n(5 : "hello" : 2.5)\n')
    assert len(params) == 1
    (e,) = params[0].entries
    assert e.phrases == ["hello"] and e.biases == [2.5] and e.duration == 5
    assert not e.is_range


def test_parse_multi_bias_and_range():
    params = parse_elb('(3 : "abc" : 1.0, 2.0)\n(4 : "xyz" : -1.0~-5.0)\n')
    e1, e2 = params[0].entries
    assert e1.biases == [1.0, 2.0] and not e1.is_range
    assert e2.biases == [-1.0, -5.0] and e2.is_range


def test_parse_exitword_states_and_ops():
    text = '(2 : "a" : 1)\n"\\n"\n(3 : "b" : 2)\n"DONE" >>\n(1 : "c" : 3)\n'
    params = parse_elb(text)
    assert len(params) == 3
    assert params[0].exitword == "\n" and params[0].op == ""
    assert params[1].exitword == "DONE" and params[1].op == ">>"
    assert params[2].entries[0].phrases == ["c"]


def test_parse_persistent_entries():
    text = '((10 : "keep" : 1))\n"x"\n(2 : "other" : 2)\n"y"\n(())\n"z"\n'
    params = parse_elb(text)
    # state 0 has the persistent entry; state 1 inherits it + its own;
    # state 2 (after the (()) clear) inherits nothing new on the NEXT
    # exitword — the clear empties the persistent set going forward
    assert [p.phrases for p in (params[0].entries[0],)] == [["keep"]]
    assert len(params[1].entries) == 2          # inherited + own
    assert params[1].entries[0].phrases == ["keep"]
    assert params[0].entries[0].duration == 10


def test_parse_sampler_param_entry():
    params = parse_elb("(8 : temp ~0.5, top_k ~10)\n")
    (e,) = params[0].entries
    assert e.biases == [] and e.phrases == [""]
    names = __import__(
        "ik_llama_cpp_tpu.runtime.expiring_bias",
        fromlist=["ELB_PARAM_NAMES"]).ELB_PARAM_NAMES
    deltas = dict(zip(names, e.addsubs))
    assert deltas["temp"] == 0.5 and deltas["top_k"] == 10.0


def test_parse_inline_comment_and_escapes():
    params = parse_elb('(2 : "a\\nb" : 1)  # trailing comment\n')
    assert params[0].entries[0].phrases == ["a\nb"]


# --------------------------------------------------------------- state build


class _Tok:
    """One id per character; piece == the character."""

    def __init__(self):
        self.tokens = [chr(i) for i in range(128)]

    def encode(self, text, add_bos=False):
        return [ord(c) for c in text if ord(c) < 128]

    def decode_bytes(self, ids):
        return "".join(chr(i) for i in ids).encode()


def test_states_extrapolate_and_conds():
    tok = _Tok()
    states = build_elb_states(tok, parse_elb('(5 : "cat" : 1.0, 2.0)\n'))
    (st,) = states
    # first token 'c' biased 1.0 with cond 'c'; 'a','t' are other_tokens
    # with extrapolated bias 2.0 and conds 'c', 'ca'
    assert [(t.id, t.bias, t.cond) for t in st.first_tokens] == \
        [(ord("c"), 1.0, "c")]
    others = {(t.id, t.cond): (t.bias, t.duration) for t in st.other_tokens}
    assert others[(ord("a"), "c")] == (2.0, 6)       # duration + j
    assert others[(ord("t"), "ca")] == (2.0, 7)
    assert st.delay == 7                             # positive biases
    assert st.max_cond_len == 2


def test_states_range_interpolation():
    st = build_elb_states(_Tok(), parse_elb('(3 : "abcd" : 0.0~3.0)\n'))[0]
    # interpolated biases 0,1,2,3 — first token bias 0 → no first_tokens
    assert st.first_tokens == []
    assert [t.bias for t in sorted(st.other_tokens, key=lambda t: t.id)] == \
        [1.0, 2.0, 3.0]


def test_states_negative_duration_infinite():
    st = build_elb_states(_Tok(), parse_elb('(-1 : "ab" : 0, 4.0)\n'))[0]
    (t,) = st.other_tokens
    # int32 `-1 ^ 0x7FFFFFFF` = INT32_MIN, then size_t-cast with the m=-1
    # per-token offset: 2^64 - 2^31 - 1 — quasi-infinite
    assert t.duration == (1 << 64) - (1 << 31) - 1
    assert t.duration > 1 << 62


def test_states_jumpword_assignment():
    text = '(2 : "a" : 1)\n"X"\n(2 : "b" : 1)\n"J" >>\n(2 : "c" : 1)\n'
    states = build_elb_states(_Tok(), parse_elb(text))
    assert states[0].jumpword == "J" and states[0].jump_idx == 2
    assert states[1].jumpword == ""                  # op marks EARLIER states


# ------------------------------------------------------------------ runtime


def _runtime(text, sampler=None):
    params = parse_elb(text)
    return ElbRuntime(build_elb_states(_Tok(), params), params,
                      sampler or SamplerParams())


def test_apply_first_token_not_if_seen():
    rt = _runtime('(5 : "cat" : 1.0, 2.0)\n')
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "")                 # empty text: first token biased
    assert logits[ord("c")] == 1.0 and logits[ord("a")] == 0.0
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "xc")               # ends with 'c': continuation bias
    assert logits[ord("c")] == 0.0       # "no bias if seen"
    assert logits[ord("a")] == 2.0       # cond 'c' matched
    assert logits[ord("t")] == 0.0       # cond 'ca' not matched
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "xca")
    assert logits[ord("t")] == 2.0


def test_apply_expiry_by_countup():
    rt = _runtime('(1 : "c" : 3.0)\n"Z"\n')
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "")
    assert logits[ord("c")] == 3.0
    rt.accept("", "q")                   # countup 1 == duration → expired
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "q")
    assert logits[ord("c")] == 0.0


def test_accept_exitword_advances_state():
    rt = _runtime('(9 : "a" : 1.0)\n"GO"\n(9 : "b" : 2.0)\n')
    assert rt.idx == 0
    rt.accept("", "xG")                  # split across pieces
    assert rt.idx == 0
    rt.accept("xG", "O")
    assert rt.idx == 1
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "xGO")
    assert logits[ord("b")] == 2.0 and logits[ord("a")] == 0.0


def test_accept_jumpword_skips_states():
    text = '(9 : "a" : 1.0)\n"X"\n(9 : "b" : 1.0)\n"J" >>\n(9 : "c" : 5.0)\n'
    rt = _runtime(text)
    rt.accept("", "J")                   # jumpword on state 0 → state 2
    assert rt.idx == 2
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "J")
    assert logits[ord("c")] == 5.0


def test_sampler_param_duration_toggle():
    sp = SamplerParams(temp=0.8, top_k=40)
    rt = _runtime("(2 : temp ~0.5, top_k ~10)\n", sp)
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "")                 # countup 0 → add
    assert sp.temp == pytest.approx(1.3) and sp.top_k == 50
    rt.accept("", "x")
    rt.apply(logits, "x")                # countup 1: unchanged
    assert sp.temp == pytest.approx(1.3)
    rt.accept("x", "y")
    rt.apply(logits, "xy")               # countup 2 == duration → subtract
    assert sp.temp == pytest.approx(0.8) and sp.top_k == 40


def test_sampler_param_phrase_toggle():
    sp = SamplerParams(temp=0.8)
    rt = _runtime('(99 : "<t>" : temp ~0.4)\n')
    rt.sampler = sp
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "before")           # phrase absent: no toggle
    assert sp.temp == pytest.approx(0.8)
    rt.apply(logits, "before<t>")        # 1 occurrence (odd) → add
    assert sp.temp == pytest.approx(1.2)
    rt.apply(logits, "before<t>mid<t>")  # 1 NEW occurrence (odd) → subtract
    assert sp.temp == pytest.approx(0.8)


def test_exit_undoes_sampler_bias():
    sp = SamplerParams(temp=0.8)
    rt = _runtime('(50 : temp ~0.6)\n"END"\n(5 : "b" : 1.0)\n', sp)
    logits = np.zeros(128, np.float32)
    rt.apply(logits, "")
    assert sp.temp == pytest.approx(1.4)
    rt.accept("", "END")
    assert rt.idx == 1
    assert sp.temp == pytest.approx(0.8)     # undone on state exit


def test_build_elb_runtime_list_and_empty():
    tok = _Tok()
    sp = SamplerParams()
    assert build_elb_runtime(tok, "", sp) is None
    assert build_elb_runtime(tok, "# only comments\n", sp) is None
    rt = build_elb_runtime(tok, ['(2 : "a" : 1.0)'], sp)
    assert rt is not None and len(rt.states) == 1


# -------------------------------------------------------------- engine level


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    model = make_tiny_llama_gguf(tmp_path_factory.mktemp("elb") / "m.gguf",
                                 seed=7)
    rt = Runtime.from_gguf(model)
    eng = BatchEngine(rt, n_slots=2, capacity=128)
    eng.start()
    yield eng
    eng.stop()


def _run(engine, req, timeout=120):
    q = queue.Queue()
    req.stream_queue = q
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
    raise TimeoutError


def test_engine_elb_steers_first_tokens(engine):
    # a huge expiring bias on "er" forces greedy onto its token for the
    # bias duration; afterwards generation reverts to the unbiased path
    tok = engine.rt.tokenizer
    base = _run(engine, Request(prompt_ids=list(range(10, 20)), n_predict=6,
                                sampler=SamplerParams(temp=0.0)))
    req = Request(prompt_ids=list(range(10, 20)), n_predict=6,
                  sampler=SamplerParams(temp=0.0),
                  expiring_logit_bias=['(1 : "er" : 100.0)'])
    toks = _run(engine, req)
    er_ids = set(tok.encode("er", add_bos=False))
    assert toks[0] in er_ids
    assert toks != base
    # same request with the bias already expired at token 2+: the tail
    # after the forced first token follows greedy from that prefix
    assert toks[0] != base[0] or base[0] in er_ids
