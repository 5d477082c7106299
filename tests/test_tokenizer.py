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
