"""llguidance-analogue adapter (runtime/llg.py): uniform grammar kinds
(gbnf/regex/json/lark) + the lark -> GBNF translator.

Reference parity target: common/llguidance.cpp (the optional adapter whose
grammar_kind/grammar_data pair selects the dialect; behaviorally the
constraint must admit exactly the dialect's language).
"""
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(__file__))

from ik_llama_cpp_tpu.runtime.llg import (lark_to_gbnf, to_gbnf,
                                          constraint_from,
                                          LarkTranslateError,
                                          register_backend, _BACKENDS)
from ik_llama_cpp_tpu.runtime.grammar import Grammar


def _accepts(gbnf: str, text: str) -> bool:
    g = Grammar(gbnf)
    return g.accept_text(text) and g.done


class TestLarkTranslate:
    def test_literals_and_alternatives(self):
        g = lark_to_gbnf('start: "yes" | "no"\n')
        assert _accepts(g, "yes") and _accepts(g, "no")
        assert not _accepts(g, "maybe")

    def test_rule_refs_and_postfix(self):
        g = lark_to_gbnf(
            'start: greeting name+\n'
            'greeting: "hi " | "hello "\n'
            'name: "bob" | "eve"\n')
        assert _accepts(g, "hi bob")
        assert _accepts(g, "hello bobeve")
        assert not _accepts(g, "hi ")

    def test_optional_brackets_and_star(self):
        g = lark_to_gbnf('start: "a" ["b"] "c"*\n')
        assert _accepts(g, "a")
        assert _accepts(g, "abccc")
        assert not _accepts(g, "abb")

    def test_uppercase_terminals_and_regex(self):
        g = lark_to_gbnf(
            'start: INT ("," INT)*\n'
            'INT: /[0-9]+/\n')
        assert _accepts(g, "1,23,456")
        assert not _accepts(g, "1,,2")

    def test_continuation_lines(self):
        g = lark_to_gbnf('start: "a"\n   | "b"\n')
        assert _accepts(g, "a") and _accepts(g, "b")

    def test_ignore_directive_rejected(self):
        with pytest.raises(LarkTranslateError):
            lark_to_gbnf('start: "a"\n%ignore /\\s+/\n')

    def test_missing_start_rejected(self):
        with pytest.raises(LarkTranslateError):
            lark_to_gbnf('value: "a"\n')

    def test_undefined_ref_rejected(self):
        with pytest.raises(LarkTranslateError):
            lark_to_gbnf('start: nope\n')

    def test_rule_named_root_no_collision(self):
        g = lark_to_gbnf('start: root "!"\nroot: "x"\n')
        assert _accepts(g, "x!")


class TestKinds:
    def test_gbnf_passthrough(self):
        assert to_gbnf("gbnf", 'root ::= "a"') == 'root ::= "a"'

    def test_regex_kind(self):
        g = to_gbnf("regex", "[ab]+c?")
        assert _accepts(g, "abba") and _accepts(g, "ac")
        assert not _accepts(g, "cc")

    def test_json_kind(self):
        g = to_gbnf("json", '{"type": "object", "properties": '
                            '{"x": {"type": "integer"}}, "required": ["x"]}')
        assert _accepts(g, '{"x": 3}')

    def test_unknown_kind(self):
        with pytest.raises(ValueError):
            to_gbnf("peg", "start: 'a'")


class _FakeTok:
    eos_id = 0

    def decode(self, ids):
        return {1: "a", 2: "b", 3: "c"}.get(ids[0], "")


def test_constraint_from_builtin_filters():
    import numpy as np
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams
    s = constraint_from("lark", 'start: "ab"\n', _FakeTok())
    rng = np.random.default_rng(0)
    logits = np.array([0.0, 5.0, 1.0, 9.0])   # argmax = "c", banned
    tok = s.filter_and_pick(logits, SamplerParams(temp=0.0), rng)
    assert tok == 1                            # forced to "a"
    tok = s.filter_and_pick(logits, SamplerParams(temp=0.0), rng)
    assert tok == 2                            # then "b"


def test_registered_backend_takes_priority():
    calls = []

    def fake(kind, data, tok):
        calls.append((kind, data))
        return "SENTINEL"

    register_backend("myengine", fake)
    try:
        out = constraint_from("lark", "start: \"a\"", _FakeTok(),
                              backend="myengine")
        assert out == "SENTINEL" and calls == [("lark", 'start: "a"')]
    finally:
        _BACKENDS.pop("myengine", None)


def test_server_grammar_kind_field():
    """_grammar_from normalizes grammar_kind dialects to GBNF."""
    from ik_llama_cpp_tpu.server.app import _grammar_from
    g = _grammar_from({"grammar": "start: \"ok\"", "grammar_kind": "lark"})
    assert _accepts(g, "ok")
    g = _grammar_from({"grammar": "[0-9]+", "grammar_kind": "regex"})
    assert _accepts(g, "42")
