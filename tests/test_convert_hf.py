"""HF -> GGUF conversion: 3-way parity (transformers torch forward vs our
engine vs the reference engine) on a tiny randomly-initialized HF llama."""
import json
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.tools.convert_hf import convert

REFBUILD = Path("/tmp/refbuild")
LDPATH = f"{REFBUILD}/src:{REFBUILD}/ggml/src"


@pytest.fixture(scope="module")
def hf_model(tmp_path_factory):
    d = tmp_path_factory.mktemp("hf") / "tiny-llama"
    cfg = transformers.LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.save_pretrained(d, safe_serialization=True)
    return d, model


def test_convert_and_run(hf_model, tmp_path):
    d, model = hf_model
    out = tmp_path / "converted.gguf"
    convert(d, out, outtype="f32")

    ids = [1, 17, 42, 99, 7, 250, 3]
    with torch.no_grad():
        hf_logits = model(torch.tensor([ids])).logits[0].float().numpy()

    rt = Runtime.from_gguf(out)
    ours = rt.all_position_logits(ids)

    def sm(x):
        x = np.asarray(x, np.float64)
        x = x - x.max(-1, keepdims=True)
        e = np.exp(x)
        return e / e.sum(-1, keepdims=True)

    l1 = np.abs(sm(ours) - sm(hf_logits)).sum(-1)
    agree = (ours.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert l1.max() < 0.15, f"vs transformers: max L1 {l1.max():.4f}"
    assert agree >= 0.85, f"argmax agree {agree:.2%}"


@pytest.mark.skipif(not (REFBUILD / "src/libllama.so").exists(),
                    reason="reference build unavailable")
def test_reference_engine_reads_converted_file(hf_model, tmp_path):
    d, _ = hf_model
    out = tmp_path / "conv_ref.gguf"
    convert(d, out, outtype="f16")
    env = dict(os.environ, LD_LIBRARY_PATH=LDPATH)
    r = subprocess.run(["/tmp/gen_logits", str(out), str(tmp_path / "o.bin"),
                        "Hi", "2"], env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-600:]


def _sm(x):
    x = np.asarray(x, np.float64)
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def _convert_parity(hf_cfg_cls, hf_model_cls, tmp_path, name, ids=None,
                    tol=0.15, **cfg_kw):
    d = tmp_path / name
    cfg = hf_cfg_cls(**cfg_kw)
    torch.manual_seed(0)
    model = hf_model_cls(cfg)
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / f"{name}.gguf"
    convert(d, out, outtype="f32")
    ids = ids or [1, 17, 42, 99, 7, 250, 3]
    with torch.no_grad():
        hf_logits = model(torch.tensor([ids])).logits[0].float().numpy()
    rt = Runtime.from_gguf(out)
    ours = rt.all_position_logits(ids)
    l1 = np.abs(_sm(ours) - _sm(hf_logits)).sum(-1)
    agree = (ours.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert l1.max() < tol, f"{name}: max L1 {l1.max():.4f}"
    assert agree >= 0.85, f"{name}: argmax agree {agree:.2%}"


def test_convert_gemma2(tmp_path):
    _convert_parity(
        transformers.Gemma2Config, transformers.Gemma2ForCausalLM, tmp_path,
        "tiny-gemma2", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rms_norm_eps=1e-5,
        sliding_window=64, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, tie_word_embeddings=True)


def test_convert_phi3(tmp_path):
    _convert_parity(
        transformers.Phi3Config, transformers.Phi3ForCausalLM, tmp_path,
        "tiny-phi3", vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)


def test_convert_mamba(tmp_path):
    _convert_parity(
        transformers.MambaConfig, transformers.MambaForCausalLM, tmp_path,
        "tiny-mamba", vocab_size=256, hidden_size=64, state_size=16,
        num_hidden_layers=2, conv_kernel=4, expand=2, use_cache=False)


def test_convert_starcoder2(tmp_path):
    _convert_parity(
        transformers.Starcoder2Config, transformers.Starcoder2ForCausalLM,
        tmp_path, "tiny-sc2", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        norm_epsilon=1e-5, use_bias=True, tie_word_embeddings=False)


def test_convert_granite(tmp_path):
    _convert_parity(
        transformers.GraniteConfig, transformers.GraniteForCausalLM,
        tmp_path, "tiny-granite", vocab_size=256, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=512,
        embedding_multiplier=2.0, residual_multiplier=1.0,
        attention_multiplier=0.1, logits_scaling=4.0,
        tie_word_embeddings=False)
    # NOTE: residual_multiplier fixed at 1.0 here — the reference fork scales
    # the whole residual stream (build_llama.cpp:114 after add_input=true)
    # while HF granite scales only the branch; we match the fork (see
    # tests/test_cross_engine.py::test_granite_logit_parity).


@pytest.mark.parametrize("ot", ["bf16", "q4_0", "q5_1", "q6_0"])
def test_convert_outtypes(hf_model, tmp_path, ot):
    """Direct-conversion schemes (--outtype bf16 / legacy quants): the
    converted file loads, generates, and stays close to the f32 logits."""
    import numpy as np
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    d, model = hf_model
    ref = tmp_path / "r.gguf"
    convert(d, ref, outtype="f32")
    out = tmp_path / f"c_{ot}.gguf"
    convert(d, out, outtype=ot)
    ids = [1, 17, 42, 99]
    kv_kwargs = dict()
    rt_a = Runtime.from_gguf(ref)
    rt_b = Runtime.from_gguf(out)
    la, _, _ = rt_a.eval_tokens(ids, rt_a.new_cache(1, 32), 0)
    lb, _, _ = rt_b.eval_tokens(ids, rt_b.new_cache(1, 32), 0)
    la, lb = np.asarray(la[-1]), np.asarray(lb[-1])
    # quantization noise bounded: top-1 usually agrees, correlation high
    corr = float(np.corrcoef(la, lb)[0, 1])
    assert corr > 0.98, (ot, corr)
