"""LoRA adapter tests: GGUF round-trip, runtime application (llm_build_lora_mm
semantics), merge (export-lora), PEFT conversion."""
import json

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.runtime.lora import (
    LoraAdapter, apply_lora, load_lora_gguf, merge_lora, set_lora_scale,
    strip_lora, write_lora_gguf)


RANK = 4


def _mk_adapter(tmp_path, cfg, seed=3):
    rng = np.random.default_rng(seed)
    tensors = {}
    for i in range(cfg.n_layer):
        a = rng.standard_normal((RANK, cfg.n_embd)).astype(np.float32) * 0.05
        b = rng.standard_normal((cfg.n_embd, RANK)).astype(np.float32) * 0.05
        tensors[f"blk.{i}.attn_q.weight"] = (a, b)
    return write_lora_gguf(tmp_path / "adapter.gguf", "llama", alpha=8.0,
                           tensors=tensors)


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    d = tmp_path_factory.mktemp("lora")
    model = make_tiny_llama_gguf(d / "base.gguf", seed=5)
    rt = Runtime.from_gguf(model, fuse=False)   # per-projection adapters
    return d, model, rt


def test_lora_gguf_roundtrip(base):
    d, _, rt = base
    path = _mk_adapter(d, rt.cfg)
    adapter = load_lora_gguf(path)
    assert adapter.alpha == 8.0
    assert adapter.rank == RANK
    assert len(adapter.tensors) == rt.cfg.n_layer
    a, b = adapter.tensors["blk.0.attn_q.weight"]
    assert a.shape == (RANK, rt.cfg.n_embd)
    assert b.shape == (rt.cfg.n_embd, RANK)


def test_lora_changes_logits_and_strip_restores(base):
    d, _, rt = base
    ids = rt.tokenizer.encode("hello world")
    before = rt.all_position_logits(ids, capacity=64)

    adapter = load_lora_gguf(_mk_adapter(d, rt.cfg))
    apply_lora(rt.params, adapter)
    rt._step_fns.clear()
    after = rt.all_position_logits(ids, capacity=64)
    assert np.abs(after - before).max() > 1e-4       # adapter has an effect

    # zero scale == base model
    set_lora_scale(rt.params, 0.0, adapter)
    zeroed = rt.all_position_logits(ids, capacity=64)
    np.testing.assert_allclose(zeroed, before, atol=1e-3)

    strip_lora(rt.params)
    rt._step_fns.clear()
    restored = rt.all_position_logits(ids, capacity=64)
    np.testing.assert_allclose(restored, before, atol=1e-6)


def test_merge_lora_matches_runtime(base):
    d, model, rt = base
    path = _mk_adapter(d, rt.cfg)
    merged_path = merge_lora(model, path, d / "merged.gguf")

    adapter = load_lora_gguf(path)
    apply_lora(rt.params, adapter)
    rt._step_fns.clear()
    ids = rt.tokenizer.encode("the quick brown fox")
    runtime_logits = rt.all_position_logits(ids, capacity=64)
    strip_lora(rt.params)
    rt._step_fns.clear()

    rt2 = Runtime.from_gguf(merged_path, fuse=False)
    merged_logits = rt2.all_position_logits(ids, capacity=64)
    # merged F16 weights vs runtime low-rank: small numeric differences only
    assert np.abs(runtime_logits - merged_logits).max() < 0.15


def test_convert_peft_dir(base, tmp_path):
    d, _, rt = base
    torch = pytest.importorskip("torch")
    from ik_llama_cpp_tpu.tools.convert_lora import convert_peft_dir

    peft = tmp_path / "peft"
    peft.mkdir()
    (peft / "adapter_config.json").write_text(json.dumps({"lora_alpha": 16}))
    sd = {}
    rng = np.random.default_rng(0)
    for i in range(rt.cfg.n_layer):
        sd[f"base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight"] = \
            torch.tensor(rng.standard_normal((RANK, rt.cfg.n_embd)), dtype=torch.float32)
        sd[f"base_model.model.model.layers.{i}.self_attn.q_proj.lora_B.weight"] = \
            torch.tensor(rng.standard_normal((rt.cfg.n_embd, RANK)), dtype=torch.float32)
    torch.save(sd, peft / "adapter_model.bin")

    out = convert_peft_dir(peft, tmp_path / "conv.gguf")
    adapter = load_lora_gguf(out)
    assert adapter.alpha == 16.0
    assert f"blk.0.attn_q.weight" in adapter.tensors
