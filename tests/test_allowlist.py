"""Unicode-script allowlist biasing tests — reference
--allowlist-unicode-rule / --allowlist-pieces / --allowlist-keyword
semantics (common/common.cpp:5426 rule grammar, server-context.cpp:1696-1793
bias construction, :4630 keyword expiry)."""
import queue
import time

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.allowlist import (AllowlistState, VocabCodepoints,
                                                build_allowlist, build_biases,
                                                harmonize, parse_rule,
                                                script_of)
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
from ik_llama_cpp_tpu.server.engine import BatchEngine, Request


# ---------------------------------------------------------------- unit level


def test_script_lookup():
    assert script_of(ord("A")) == "latin"
    assert script_of(ord("я")) == "cyrillic"
    assert script_of(ord("中")) == "han"
    assert script_of(ord("あ")) == "hiragana"
    assert script_of(ord("ア")) == "katakana"
    assert script_of(ord(" ")) == "common"
    assert script_of(0x0301) == "inherited"      # combining acute
    assert script_of(0x10FFFF) == "unknown"      # past the table


def test_parse_rule_forms():
    # full form: range + script + bias
    assert parse_rule("65..90,latin:1.5") == (65, 90, "latin", 1.5)
    # script only → full range
    assert parse_rule("hiragana") == (0, 0xFFFFFFFF, "hiragana", 0.0)
    # range only (non-alpha last field → wildcard script)
    assert parse_rule("100..200") == (100, 200, "*", 0.0)
    # ascii shorthand
    assert parse_rule("ascii:2") == (0, 0x7F, "*", 2.0)
    # reversed bounds are swapped into order
    assert parse_rule("90..65,latin") == (65, 90, "latin", 0.0)
    # open-ended bounds
    assert parse_rule("..90,latin") == (0, 90, "latin", 0.0)
    assert parse_rule("100..,latin") == (100, 0xFFFFFFFF, "latin", 0.0)
    # case-folded script name
    assert parse_rule("Latin:0.25")[2] == "latin"


def test_harmonize_counts():
    # one more ruleset than keywords: last never expires — unchanged
    rs, kw = harmonize([["a"], ["b"]], ["k1"])
    assert len(rs) == 2 and kw == ["k1"]
    # too many rulesets → truncated to kws + 1
    rs, kw = harmonize([["a"], ["b"], ["c"]], ["k1"])
    assert len(rs) == 2
    # too many keywords → truncated to ruleset count
    rs, kw = harmonize([["a"]], ["k1", "k2", "k3"])
    assert kw == ["k1"]


class _FakeTok:
    """Minimal tokenizer: one piece per id."""

    def __init__(self, pieces):
        self.tokens = list(pieces)
        self._pieces = list(pieces)

    def decode_bytes(self, ids):
        return b"".join(self._pieces[i].encode("utf-8") for i in ids)

    def encode(self, text, add_bos=False):
        return [i for i, p in enumerate(self._pieces) if p and p in text]


PIECES = ["abc", "中文", "a中", " ", "a1", "", "érable", "こんにちは"]


def _biases(ruleset, allow_tokens=()):
    vc = VocabCodepoints(_FakeTok(PIECES))
    return build_biases(vc, ruleset, allow_tokens)


def test_bias_latin_only():
    b = _biases([(0, 0x10FFFF, "latin", 0.5)])
    assert b[0] == 0.5                     # "abc" all latin
    assert b[1] == -np.inf                 # "中文" han → banned
    assert b[2] == -np.inf                 # mixed "a中" → banned
    assert b[3] == -np.inf                 # " " common-only: no cpt matched
    assert b[4] == 0.5                     # "a1": '1' common defers, 'a' hits
    assert b[5] == -np.inf                 # empty piece: no codepoints
    assert b[6] == 0.5                     # é is latin
    assert b[7] == -np.inf                 # hiragana


def test_bias_first_match_priority_and_max():
    # 'a' (0x61) matches rule0 (bias 2.0) first; 'b','c' only rule1 (0.1);
    # token bias = max over codepoints of the FIRST-matching rule's bias
    b = _biases([(0x61, 0x61, "latin", 2.0), (0, 0x10FFFF, "latin", 0.1)])
    assert b[0] == 2.0
    # wildcard script matches everything in range
    b = _biases([(0, 0x10FFFF, "*", -1.0)])
    assert b[1] == -1.0 and b[7] == -1.0


def test_allow_pieces_override():
    # all-banning ruleset, but the piece's tokens get the max rule bias
    tok = _FakeTok(PIECES)
    vc = VocabCodepoints(tok)
    ids = tok.encode("中文")
    b = build_biases(vc, [(1, 0, "latin", 0.75)], ids)
    assert b[1] == 0.75                    # "中文" rescued
    assert b[0] == -np.inf                 # others still banned


def test_keyword_expiry_state():
    st = AllowlistState(biases=[np.zeros(4), np.ones(4), np.full(4, 2.0)],
                        keywords=["STOP", "GO"], kw_delay=0)
    st.update("hello", 0, 1)
    assert st.idx == 0
    # keyword split across appends: search starts len(kw)-1 chars back
    st.update("helloSTO", 5, 2)
    assert st.idx == 0
    st.update("helloSTOP", 8, 3)
    assert st.idx == 1
    # both remaining keywords in one append → advance twice
    st.update("helloSTOPxxGO", 9, 4)
    assert st.idx == 2
    assert st.active_bias() is None or st.idx < len(st.biases)


def test_keyword_delay():
    st = AllowlistState(biases=[np.zeros(2), np.ones(2)],
                        keywords=["K"], kw_delay=5)
    st.update("K", 0, 3)                   # n_decoded < delay: frozen
    assert st.idx == 0
    st.update("K", 0, 5)
    assert st.idx == 1
    assert np.array_equal(st.active_bias(), np.ones(2))


def test_build_allowlist_empty_rules_disabled():
    tok = _FakeTok(PIECES)
    assert build_allowlist(tok, [], ["k"]) is None
    assert build_allowlist(tok, [[]], []) is None


# ---------------------------------------------------------- engine level


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    model = make_tiny_llama_gguf(tmp_path_factory.mktemp("allow") / "m.gguf",
                                 seed=5)
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


def test_engine_allowlist_restricts_tokens(engine):
    # ban everything except the tokens of one piece: every generated token
    # must come from that tiny allow set (greedy would otherwise roam)
    tok = engine.rt.tokenizer
    allowed = set(tok.encode("er", add_bos=False))
    assert allowed
    req = Request(prompt_ids=list(range(10, 20)), n_predict=6,
                  sampler=SamplerParams(temp=0.0),
                  allow_rules=[[(0x10FFFE, 0x10FFFE, "latin", 0.0)]],
                  allow_pieces=["er"])
    toks = _run(engine, req)
    assert toks and set(toks) <= allowed


def test_engine_allowlist_keyword_expires(engine):
    # ruleset 0 pins generation to one piece; once its text shows up the
    # keyword expires it and ruleset 1 (allow-everything) takes over
    tok = engine.rt.tokenizer
    # ruleset 0: only 'e' and 'r' codepoints allowed — tokens are clean
    # ASCII, so the keyword (the greedy first token's text) is printable
    er_rules = [(0x65, 0x65, "latin", 0.0), (0x72, 0x72, "latin", 0.0)]
    allowed = {i for i in range(len(tok.tokens))
               if tok.decode_bytes([i]).decode("utf-8", errors="replace")
               and set(tok.decode_bytes([i]).decode(
                   "utf-8", errors="replace")) <= set("er")}
    probe = Request(prompt_ids=list(range(10, 20)), n_predict=1,
                    sampler=SamplerParams(temp=0.0),
                    allow_rules=[list(er_rules)])
    first = _run(engine, probe)[0]
    kw_text = tok.decode_bytes([first]).decode("utf-8", errors="replace")
    assert kw_text
    req = Request(prompt_ids=list(range(10, 20)), n_predict=8,
                  sampler=SamplerParams(temp=0.0),
                  allow_rules=[list(er_rules),
                               [(0, 0x10FFFF, "*", 0.0)]],
                  allow_kws=[kw_text])
    toks = _run(engine, req)
    assert toks[0] in allowed
    assert any(s.allowlist is not None and s.allowlist.idx >= 1
               for s in engine.slots)      # keyword fired, ruleset expired


def test_engine_unbiased_matches_baseline(engine):
    # an all-pass wildcard ruleset with bias 0 must not change greedy
    # output (EOS is logit-banned in both runs: its empty piece has no
    # codepoints, so any allowlist bans it — reference behaviour)
    bias = {engine.rt.tokenizer.eos_id: -101.0}
    base = Request(prompt_ids=list(range(30, 40)), n_predict=5,
                   sampler=SamplerParams(temp=0.0, logit_bias=bias))
    out1 = _run(engine, base)
    biased = Request(prompt_ids=list(range(30, 40)), n_predict=5,
                     sampler=SamplerParams(temp=0.0, logit_bias=bias),
                     allow_rules=[[(0, 0x10FFFF, "*", 0.0)]])
    out2 = _run(engine, biased)
    assert out1 == out2
