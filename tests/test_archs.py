"""Model-family coverage: gemma2/gemma3 (sandwich norms, softcaps, SWA,
per-layer rope base) and phi3 (fused qkv, fused gate+up, partial rotary)
load, run, and produce sane causal logits.

Structure mirrors the reference's per-arch graphs (src/graphs/build_gemma2.cpp,
build_gemma3.cpp, build_phi3.cpp).
"""
import numpy as np
import pytest

from fixtures import make_tiny_gemma_gguf, make_tiny_phi3_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime


@pytest.fixture(scope="module")
def gemma2_rt(tmp_path_factory):
    p = make_tiny_gemma_gguf(tmp_path_factory.mktemp("g2") / "g2.gguf", version=2)
    return Runtime.from_gguf(p)


@pytest.fixture(scope="module")
def gemma3_rt(tmp_path_factory):
    p = make_tiny_gemma_gguf(tmp_path_factory.mktemp("g3") / "g3.gguf", version=3)
    return Runtime.from_gguf(p)


@pytest.fixture(scope="module")
def phi3_rt(tmp_path_factory):
    p = make_tiny_phi3_gguf(tmp_path_factory.mktemp("p3") / "p3.gguf")
    return Runtime.from_gguf(p)


def _check_forward(rt, n_layers_swa=None):
    ids = rt.tokenizer.encode("The quick brown fox")
    logits = rt.all_position_logits(ids, capacity=64)
    assert logits.shape == (len(ids), rt.cfg.n_vocab)
    assert np.all(np.isfinite(logits))
    return logits


def test_gemma2_config(gemma2_rt):
    cfg = gemma2_rt.cfg
    assert cfg.embd_scale == pytest.approx(cfg.n_embd ** 0.5)
    assert cfg.act == "gelu"
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    # even layers sliding (build_gemma2.cpp: il % 2 == 0 -> SWA)
    assert cfg.layer_is_swa(0) and not cfg.layer_is_swa(1) and cfg.layer_is_swa(2)


def test_gemma3_config(gemma3_rt):
    cfg = gemma3_rt.cfg
    assert cfg.use_qk_norm
    assert cfg.rope_freq_base_swa == 10000.0 and cfg.rope_freq_base == 1000000.0
    # (il+1) % 6 != 0 -> SWA
    assert all(cfg.layer_is_swa(i) for i in range(cfg.n_layer))
    full_cfg = cfg.swa_layer_mask
    assert len(full_cfg) == cfg.n_layer


def test_gemma2_forward(gemma2_rt):
    logits = _check_forward(gemma2_rt)
    # final softcap bounds all logits to (-30, 30)
    assert np.abs(logits).max() < 30.0


def test_gemma3_forward(gemma3_rt):
    _check_forward(gemma3_rt)


def test_phi3_forward(phi3_rt):
    cfg = phi3_rt.cfg
    assert cfg.rope_dim == cfg.head_dim // 2     # partial rotary round-trip
    _check_forward(phi3_rt)


def test_phi3_causality(phi3_rt):
    """Future tokens must not affect earlier logits (validates the fused-qkv
    split and cache write path)."""
    ids = phi3_rt.tokenizer.encode("a b c d e f")
    full = phi3_rt.all_position_logits(ids, capacity=64)
    half = phi3_rt.all_position_logits(ids[: len(ids) // 2], capacity=64)
    np.testing.assert_allclose(full[: len(ids) // 2], half, rtol=0.05, atol=0.05)


def test_gemma2_generate(gemma2_rt):
    _, out = gemma2_rt.generate("hello", max_new_tokens=4, capacity=64)
    assert len(out) >= 1


def test_yarn_rope_scaling(tmp_path):
    """YaRN metadata must change the rope tables (long-context scaling)."""
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.gguf.writer import GGUFWriter
    import ik_llama_cpp_tpu.gguf.reader as R

    base = make_tiny_llama_gguf(tmp_path / "base.gguf", seed=11)
    rt0 = Runtime.from_gguf(base)
    ids = rt0.tokenizer.encode("a b c d e f g h")
    plain = rt0.all_position_logits(ids, capacity=64)

    # same weights + yarn scaling metadata
    gg = R.load_gguf(base)
    w = GGUFWriter(tmp_path / "yarn.gguf", arch="llama")
    for k, v in gg.metadata.items():
        if k != "general.architecture":
            w.add(k, v)
    w.add("llama.rope.scaling.type", "yarn")
    w.add("llama.rope.scaling.factor", 4.0)
    w.add("llama.rope.scaling.original_context_length", 128)
    for name, info in gg.tensors.items():
        w.add_tensor(name, info.data, shape=info.shape, ggml_type=info.ggml_type)
    w.write()

    rt1 = Runtime.from_gguf(tmp_path / "yarn.gguf")
    assert rt1.cfg.rope_scaling == "yarn"
    scaled = rt1.all_position_logits(ids, capacity=64)
    assert np.all(np.isfinite(scaled))
    assert np.abs(scaled[-1] - plain[-1]).max() > 1e-4   # scaling took effect
