"""Tokenizer golden tests against the reference's fixture files.

Same protocol as the reference's test-tokenizer-0: texts from
ggml-vocab-X.gguf.inp (separated by __ggml_vocab_test__) must produce the
token ids in ggml-vocab-X.gguf.out line-for-line.
"""
from pathlib import Path

import pytest

from ik_llama_cpp_tpu.gguf.reader import GGUFReader
from ik_llama_cpp_tpu.runtime.tokenizer import tokenizer_from_gguf

REF = Path("/root/reference/models")

# vocabs we commit to exact parity on in round 1
VOCABS = ["llama-spm", "gpt-2", "phi-3", "mpt", "starcoder", "refact",
          "falcon", "deepseek-coder", "deepseek-llm", "bert-bge"]


def load_cases(name):
    inp = (REF / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    out = (REF / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    id_lines = out.splitlines()
    assert len(texts) == len(id_lines) + 1 or len(texts) == len(id_lines)
    cases = []
    for text, line in zip(texts, id_lines):
        ids = [int(x) for x in line.split()]
        cases.append((text, ids))
    return cases


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
@pytest.mark.parametrize("name", VOCABS)
def test_tokenizer_golden(name):
    r = GGUFReader(REF / f"ggml-vocab-{name}.gguf")
    tok = tokenizer_from_gguf(r.metadata)
    cases = load_cases(name)
    bad = []
    for text, ids in cases:
        got = tok.encode(text, add_bos=False, add_eos=False, parse_special=False)
        if got != ids:
            bad.append((text, ids, got))
    assert not bad, f"{len(bad)}/{len(cases)} mismatches; first: {bad[0]!r}"


@pytest.mark.skipif(not REF.exists(), reason="reference fixtures unavailable")
def test_spm_decode_roundtrip():
    r = GGUFReader(REF / "ggml-vocab-llama-spm.gguf")
    tok = tokenizer_from_gguf(r.metadata)
    for text in ["Hello world", "  leading spaces", "múltiple ñ languages 中文"]:
        ids = tok.encode(text, add_bos=False, parse_special=False)
        # llama.cpp detokenize of spm strips the leading space it added
        dec = tok.decode(ids)
        assert dec.lstrip(" ") == text.lstrip(" ") or dec == " " + text


def test_rwkv_tokenizer():
    """RWKV world tokenizer (llm_tokenizer_rwkv, llama-vocab.cpp:1243):
    escaped byte vocab + greedy longest trie match over raw bytes."""
    from ik_llama_cpp_tpu.runtime.tokenizer import Tokenizer
    toks = ["\\x00", "a", "b", "ab", "abc", "\\n", "hel", "hello", " ",
            "\\x41\\x42", "\\t", "wor", "world"]
    t = Tokenizer(model="rwkv", tokens=toks, scores=None, token_types=None,
                  merges=None, add_bos=False)
    ids = t.encode("hello world", add_bos=False)
    assert ids == [toks.index("hello"), toks.index(" "),
                   toks.index("world")]
    assert t.decode(ids) == "hello world"
    # longest match wins over shorter prefixes
    assert t.encode("abc", add_bos=False) == [toks.index("abc")]
    # hex escapes decode to raw bytes
    assert t.decode(t.encode("AB\t\n", add_bos=False)) == "AB\t\n"
    # unknown byte -> unk id (0 fallback) and single-byte advance
    ids = t.encode("a#b", add_bos=False)
    assert ids[0] == toks.index("a") and ids[-1] == toks.index("b")
