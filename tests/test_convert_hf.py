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
