"""GBNF grammar engine + JSON-schema converter tests (mirrors the reference's
test-grammar-parser / test-grammar-integration / test-json-schema-to-grammar)."""
import json

import numpy as np
import pytest

from ik_llama_cpp_tpu.runtime.grammar import Grammar, GrammarSampler, GBNFParseError
from ik_llama_cpp_tpu.runtime.json_schema import json_schema_to_gbnf

JSON_GBNF = r'''
root ::= object
value ::= object | array | string | number | ("true" | "false" | "null") ws
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
array ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\"" ( [^"\\] | "\\" (["\\/bfnrt] | "u" [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F] [0-9a-fA-F]) )* "\"" ws
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? ws
ws ::= [ \t\n]*
'''


def accepts(g_text, s, root="root"):
    g = Grammar(g_text)
    ok = g.accept_text(s)
    return ok and g.done


def test_simple_grammar():
    g = 'root ::= "ab" | "cd"'
    assert accepts(g, "ab")
    assert accepts(g, "cd")
    assert not accepts(g, "ad")
    assert not accepts(g, "a")  # incomplete


def test_repetition():
    g = 'root ::= "a"+ "b"* "c"?'
    assert accepts(g, "a")
    assert accepts(g, "aaabbc")
    assert accepts(g, "aac")
    assert not accepts(g, "b")


def test_char_classes():
    g = 'root ::= [a-z0-9]+ [^x]'
    assert accepts(g, "abc1y")
    assert not accepts(g, "abcx")
    assert not accepts(g, "ABC1y")


def test_json_grammar_accepts_valid_json():
    for doc in ['{}', '{"a": 1}', '{"a": [1, 2, {"b": "c"}], "d": true}',
                '{"x": -1.5e3}']:
        assert accepts(JSON_GBNF, doc), doc
    for bad in ['{', '{"a"}', '{a: 1}', '[1]']:
        assert not accepts(JSON_GBNF, bad), bad


def test_parse_error():
    with pytest.raises(GBNFParseError):
        Grammar('foo ::= "a"')  # no root


def test_json_schema_to_gbnf():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "kind": {"enum": ["a", "b"]},
        },
        "required": ["name", "age", "tags", "kind"],
    }
    g_text = json_schema_to_gbnf(schema)
    g = Grammar(g_text)
    doc = '{"name": "bob", "age": 3, "tags": ["x", "y"], "kind": "a"}'
    assert g.accept_text(doc) and g.done, g_text
    g2 = Grammar(g_text)
    assert not (g2.accept_text('{"name": 5') )  # wrong type rejected


def test_grammar_constrained_generation():
    """End to end: grammar-constrained sampling emits valid JSON."""
    import sys
    sys.path.insert(0, "tests")
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.sampling import SamplerParams

    p = make_tiny_llama_gguf("/tmp/gr_tiny.gguf", seed=3)
    rt = Runtime.from_gguf(p)
    schema = {"type": "object", "properties": {"n": {"type": "integer"}},
              "required": ["n"]}
    g = Grammar(json_schema_to_gbnf(schema))
    gs = GrammarSampler(g, rt.tokenizer)

    kv = rt.new_cache(1, 256)
    ids = rt.tokenizer.encode("produce json:")
    logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
    rng = np.random.default_rng(0)
    sp = SamplerParams(temp=0.9, top_k=0)
    out = []
    for _ in range(40):
        tok = gs.filter_and_pick(logits[-1], sp, rng, history=ids + out)
        out.append(tok)
        if g.done and rt.tokenizer.decode(out).rstrip().endswith("}"):
            break
        logits, kv, n_past = rt.eval_tokens([tok], kv, n_past)
    text = rt.tokenizer.decode(out)
    json.loads(text)  # must parse


import pytest
from pathlib import Path

_REF_GRAMMARS = sorted(Path("/root/reference/grammars").glob("*.gbnf"))


@pytest.mark.parametrize("path", _REF_GRAMMARS, ids=lambda p: p.stem)
def test_reference_sample_grammars_parse(path):
    """Every sample grammar shipped by the reference must parse."""
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    g = Grammar(path.read_text())
    assert g is not None


def test_reference_json_grammar_accepts_json():
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    g = Grammar((Path("/root/reference/grammars") / "json.gbnf").read_text())
    s = '{"a": [1, 2.5, "x"], "b": null, "c": true}'
    m = g.copy()
    for ch in s:
        assert m.accept_char(ord(ch)), f"rejected at {ch!r}"
    assert m.done if not callable(m.done) else m.done()


def test_reference_arithmetic_grammar():
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    g = Grammar((Path("/root/reference/grammars") / "arithmetic.gbnf").read_text())
    m = g.copy()
    for ch in "1+2*(3-4)\n":
        assert m.accept_char(ord(ch)), ch


def test_regex_interior_anchor_rejected():
    """'a$b' matches nothing; dropping the anchor silently would accept
    'ab'. Interior anchors must raise (regression)."""
    from ik_llama_cpp_tpu.runtime.json_schema import regex_to_gbnf_expr
    with pytest.raises(ValueError, match="anchor"):
        regex_to_gbnf_expr("a$b")
    with pytest.raises(ValueError, match="anchor"):
        regex_to_gbnf_expr("a^b")
    # leading ^ / trailing $ remain no-ops
    assert regex_to_gbnf_expr("^ab$") == '"a" "b"'


def test_regex_negated_class_escape_rejected():
    """\\D inside [...] can't be expressed in GBNF — must fail at convert
    time with a clear error, not at Grammar() parse time (regression)."""
    from ik_llama_cpp_tpu.runtime.json_schema import regex_to_gbnf_expr
    with pytest.raises(ValueError, match="character class"):
        regex_to_gbnf_expr(r"[\D]+")
    # non-negated class escapes still expand
    assert "0-9" in regex_to_gbnf_expr(r"[\d]+")
    # negated escapes OUTSIDE a class are fine ([^0-9])
    assert regex_to_gbnf_expr(r"\D") == "[^0-9]"


def test_array_max_items_zero():
    """maxItems=0 must admit ONLY the empty array (regression: {0,0} tail
    still allowed one item)."""
    g_text = json_schema_to_gbnf(
        {"type": "array", "items": {"type": "integer"}, "maxItems": 0})
    g = Grammar(g_text)
    assert g.accept_text("[] ") or (g.accept_text("[]") and True)
    g2 = Grammar(g_text)
    assert not g2.accept_text("[1")
