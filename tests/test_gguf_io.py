"""GGUF writer -> reader round-trip, plus reading the reference's real vocab fixtures."""
import os
from pathlib import Path

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.gguf.reader import GGUFReader, load_gguf
from ik_llama_cpp_tpu.gguf.writer import GGUFWriter
from ik_llama_cpp_tpu.quant.quantize import quantize
from ik_llama_cpp_tpu.quant.dequant import dequantize

REF_MODELS = Path("/root/reference/models")


def test_roundtrip(tmp_path):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path, arch="llama")
    w.add("general.name", "unit-test")
    w.add("llama.block_count", 2)
    w.add("llama.embedding_length", 64)
    w.add("f.pi", 3.25)
    w.add("flag", True)
    w.add("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add("arr.i32", np.arange(5, dtype=np.int32))
    rng = np.random.default_rng(0)
    wt = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight", wt)
    qbytes = quantize(wt, GGMLType.Q8_0)
    w.add_tensor("blk.0.q8.weight", qbytes, shape=(64, 8), ggml_type=GGMLType.Q8_0)
    w.write()

    r = GGUFReader(path)
    assert r.version == 3
    assert r.metadata["general.architecture"] == "llama"
    assert r.metadata["llama.block_count"] == 2
    assert abs(r.metadata["f.pi"] - 3.25) < 1e-6
    assert r.metadata["flag"] is True
    assert list(r.metadata["tokenizer.ggml.tokens"]) == ["<s>", "</s>", "hello"]
    np.testing.assert_array_equal(r.metadata["arr.i32"], np.arange(5, dtype=np.int32))

    t = r.tensors["blk.0.attn_q.weight"]
    assert t.ggml_type == GGMLType.F32
    assert t.shape == (64, 8)  # ggml ne order: row length first
    got = t.data.view(np.float32).reshape(8, 64)
    np.testing.assert_array_equal(got, wt)

    tq = r.tensors["blk.0.q8.weight"]
    assert tq.ggml_type == GGMLType.Q8_0
    deq = dequantize(tq.data, GGMLType.Q8_0, 64)
    assert deq.shape == (8, 64)
    assert float(np.abs(deq - wt).max()) < 0.02


@pytest.mark.skipif(not REF_MODELS.exists(), reason="reference fixtures unavailable")
def test_read_reference_vocab_fixtures():
    files = sorted(REF_MODELS.glob("ggml-vocab-*.gguf"))
    assert files
    for f in files:
        r = GGUFReader(f)
        assert r.metadata["general.architecture"]
        toks = r.metadata.get("tokenizer.ggml.tokens")
        assert toks is not None and len(toks) > 100


def test_split_gguf(tmp_path):
    for i in (1, 2):
        w = GGUFWriter(tmp_path / f"m-{i:05d}-of-00002.gguf", arch="llama")
        w.add("split.no", i)
        w.add_tensor(f"blk.{i}.w", np.full((2, 32), float(i), dtype=np.float32))
        w.write()
    m = load_gguf(tmp_path / "m-00001-of-00002.gguf")
    assert "blk.1.w" in m and "blk.2.w" in m
    assert m.metadata["split.no"] == 1
