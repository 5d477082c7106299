"""Tests for the smaller example-tool analogues: retrieval, gritlm-style
span embedding, gbnf-validator, regex->grammar, and the baby-llama training
loop."""
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def rt(tmp_path_factory):
    p = make_tiny_llama_gguf(tmp_path_factory.mktemp("ex") / "m.gguf", seed=5)
    return Runtime.from_gguf(p)


def test_retrieval_chunk_and_rank(rt, tmp_path):
    from ik_llama_cpp_tpu.tools.retrieval import (chunk_file, embed_texts,
                                                  rank)
    doc = tmp_path / "doc.txt"
    doc.write_text("alpha alpha alpha\nbeta beta beta\ngamma gamma gamma\n"
                   "delta delta delta\n")
    chunks = chunk_file(str(doc), chunk_size=10, separator="\n")
    assert len(chunks) == 4
    assert chunks[0].text.startswith("alpha")
    emb = embed_texts(rt, [c.text for c in chunks])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    # a chunk is its own best match
    qe = embed_texts(rt, [chunks[2].text])[0]
    top = rank(emb, qe, top_k=2)
    assert top[0][0] == 2 and top[0][1] > top[1][1]


def test_gritlm_span_embedding(rt):
    from ik_llama_cpp_tpu.tools.gritlm import encode_gritlm
    e1 = encode_gritlm(rt, "hello world", "")
    e2 = encode_gritlm(rt, "hello world", "Find the doc")
    e3 = encode_gritlm(rt, "something else entirely", "")
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5
    # same sample under different instructions stays closer than a
    # different sample (the span pooling excludes the instruction prefix,
    # but the prefix still conditions the activations)
    assert np.dot(e1, e2) > np.dot(e1, e3)


def test_gbnf_validator(tmp_path):
    from ik_llama_cpp_tpu.tools.gbnf_validator import main, validate
    g = 'root ::= "a"+ "b"'
    ok, pos = validate(g, "aaab")
    assert ok and pos == -1
    ok, pos = validate(g, "aac")
    assert not ok and pos == 2
    ok, pos = validate(g, "aa")          # incomplete -> invalid at end
    assert not ok and pos == 2
    gf = tmp_path / "g.gbnf"
    gf.write_text(g)
    inp = tmp_path / "in.txt"
    inp.write_text("aaab")
    assert main([str(gf), str(inp)]) == 0
    bad = tmp_path / "bad.gbnf"
    bad.write_text('root ::= "a"')
    inp.write_text("b")
    assert main([str(bad), str(inp)]) == 1


@pytest.mark.parametrize("pattern,good,bad", [
    (r"[0-9]+", "123", "12a"),
    (r"a|bc", "bc", "ab"),
    (r"(ab)+c?", "ababc", "aab"),
    (r"\d{2,4}", "123", "1"),
    (r"^hello (world|there)$", "hello there", "hello you"),
    (r"x.z", "xyz", "xy"),
    (r"[a-f]{3}", "abc", "abg"),
])
def test_regex_to_grammar(pattern, good, bad):
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    from ik_llama_cpp_tpu.runtime.json_schema import regex_to_gbnf
    g = Grammar(regex_to_gbnf(pattern))
    gg = g.copy()
    assert gg.accept_text(good) and gg.done
    gb = g.copy()
    assert not (gb.accept_text(bad) and gb.done)


def test_schema_pattern_and_bounds():
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    from ik_llama_cpp_tpu.runtime.json_schema import json_schema_to_gbnf
    gbnf = json_schema_to_gbnf({
        "type": "object",
        "properties": {
            "code": {"type": "string", "pattern": "[A-Z]{2}-[0-9]{3}"},
            "tags": {"type": "array", "items": {"type": "integer"},
                     "minItems": 1, "maxItems": 2},
        },
        "required": ["code", "tags"],
    })
    g = Grammar(gbnf)
    ok = g.copy()
    assert ok.accept_text('{"code": "AB-123", "tags": [1, 2]}') and ok.done
    bad = g.copy()
    assert not bad.allows_text('{"code": "ab-123", "tags": [1]}')
    toomany = g.copy()
    assert not toomany.allows_text('{"code": "AB-123", "tags": [1, 2, 3]}')


def test_template_debug_cli(tmp_path, capsys):
    from ik_llama_cpp_tpu.tools.template_debug import main
    t = tmp_path / "t.jinja"
    t.write_text(
        "{% for message in messages %}<|im_start|>{{ message.role }}\n"
        "{{ message.content }}"
        "{% if message.tool_calls %}{% for tc in message.tool_calls %}"
        '<tool_call>\n{"name": "{{ tc.function.name }}", '
        '"arguments": {{ tc.function.arguments | tojson }}}\n'
        "</tool_call>{% endfor %}{% endif %}<|im_end|>\n{% endfor %}"
        "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}")
    rc = main(["--template-file", str(t), "--render", "--parse",
               '<tool_call>\n{"name": "f", "arguments": {"x": 1}}\n'
               "</tool_call>"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "call_lead" in out and 'tool_call = f({"x": 1})' in out
    assert "get_weather" in out          # sample conversation rendered


def test_pydantic_models_to_gbnf():
    pydantic = pytest.importorskip("pydantic")
    from ik_llama_cpp_tpu.runtime.grammar import Grammar
    from ik_llama_cpp_tpu.runtime.json_schema import pydantic_models_to_gbnf

    class Point(pydantic.BaseModel):
        x: int
        y: int

    class Label(pydantic.BaseModel):
        name: str

    g = Grammar(pydantic_models_to_gbnf(Point, Label))
    ok = g.copy()
    assert ok.accept_text('{"x": 1, "y": -2}') and ok.done
    ok2 = g.copy()
    assert ok2.accept_text('{"name": "hi"}') and ok2.done
    bad = g.copy()
    assert not (bad.accept_text('{"x": 1}') and bad.done)


def test_train_baby_loss_decreases(tmp_path):
    from ik_llama_cpp_tpu.tools.train_baby import train
    p = make_tiny_llama_gguf(tmp_path / "f32.gguf", seed=6,
                             quant=GGMLType.F32)
    rt = Runtime.from_gguf(p, use_quant=False)
    ids = rt.tokenizer.encode("ab " * 200)
    _, losses = train(rt, ids, steps=25, batch=4, seq_len=16, lr=2e-3,
                      log=lambda *_: None)
    assert losses[-1] < losses[0] * 0.8, losses


def test_embedding_cli(tmp_path, capsys):
    """examples/embedding analogue: pooled + normalized vectors, cosine
    matrix, json output mode."""
    import json as _json
    from ik_llama_cpp_tpu.tools.embedding import main, normalize
    import numpy as np
    v = np.array([3.0, 4.0], np.float32)
    np.testing.assert_allclose(normalize(v, 2), [0.6, 0.8])
    np.testing.assert_allclose(normalize(v, 0), [0.75, 1.0])
    np.testing.assert_allclose(normalize(v, -1), v)

    tiny = make_tiny_llama_gguf(tmp_path / "emb.gguf", seed=5)
    main(["-m", str(tiny), "-p", "hello world", "-p", "hello world",
          "--sim"])
    out = capsys.readouterr().out
    assert "embedding 0:" in out and "1.00" in out

    main(["-m", str(tiny), "-p", "hi", "--embd-output-format", "json"])
    doc = _json.loads(capsys.readouterr().out)
    assert doc["object"] == "list" and len(doc["data"][0]["embedding"]) > 0


def test_validate_quants(tmp_path, capsys):
    """--validate-quants analogue: a clean file passes; a corrupted f16
    tensor (NaN bytes) is reported."""
    import struct
    from ik_llama_cpp_tpu.tools.validate_quants import main, validate_file
    p = make_tiny_llama_gguf(tmp_path / "v.gguf", seed=4,
                             quant=GGMLType.Q4_0)
    assert main([str(p), "-q"]) == 0
    # corrupt: overwrite part of an f32 norm payload with NaNs
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    gg = load_gguf(p)
    info = next(i for n, i in gg.tensors.items()
                if i.ggml_type == GGMLType.F32 and "norm" in n)
    raw = bytearray(p.read_bytes())
    blob = bytes(np.asarray(info.data[:64]).tobytes())
    off = raw.find(blob)
    assert off > 0
    raw[off:off + 32] = struct.pack("<f", float("nan")) * 8
    bad_p = tmp_path / "bad.gguf"
    bad_p.write_bytes(bytes(raw))
    bad = validate_file(bad_p)
    assert bad and any("NaN" in "; ".join(v) for v in bad.values()), bad
