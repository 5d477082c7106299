"""nomic-bert (rope + fused QKV + silu-par FFN) and jina-bert-v2
(ALiBi + q/k LNs + attn_norm_2 + gelu-par FFN) encoder variants —
numeric parity against the reference engine's llama_get_embeddings
(build_bert.cpp; create_bert_tensors / create_jina_bert2_tensors)."""
import os
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_tiny_bert_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime

REF_OK = Path("/tmp/refbuild/src/libllama.so").exists() and \
    Path("/tmp/gen_embd").exists()
IDS = [2, 7, 9, 12, 30, 41, 3]


def _ref_embd(model: Path, out: Path, ids) -> np.ndarray:
    env = dict(os.environ,
               LD_LIBRARY_PATH="/tmp/refbuild/src:/tmp/refbuild/ggml/src")
    r = subprocess.run(
        ["/tmp/gen_embd", str(model), str(out),
         ",".join(str(i) for i in ids)],
        env=env, capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()[-800:]
    raw = out.read_bytes()
    nt, ne = struct.unpack("<II", raw[:8])
    return np.frombuffer(raw[8:], np.float32).reshape(nt, ne)


@pytest.fixture(scope="module", params=["nomic-bert", "jina-bert-v2"])
def variant_rt(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(request.param.replace("-", "_"))
    p = make_tiny_bert_gguf(d / "m.gguf", seed=31, variant=request.param)
    return request.param, p, Runtime.from_gguf(p)


def test_loads_and_embeds(variant_rt):
    name, _, rt = variant_rt
    assert rt.cfg.arch == name
    e = rt.embed(rt.tokenizer.encode("hello world"), "mean")
    assert e.shape == (rt.cfg.n_embd,)
    assert np.isfinite(e).all()


def test_position_sensitivity(variant_rt):
    """Both variants encode position WITHOUT learned pos-embd: nomic via
    rope, jina via ALiBi — swapped token order must change the encoding."""
    _, _, rt = variant_rt
    a = rt.embed([5, 9, 12, 3], "mean", normalize=False)
    b = rt.embed([9, 5, 12, 3], "mean", normalize=False)
    assert np.abs(a - b).max() > 1e-5


def test_bidirectional(variant_rt):
    _, _, rt = variant_rt
    a = rt.embed([5, 9, 12], "none")
    b = rt.embed([5, 9, 40], "none")
    assert np.abs(a[0] - b[0]).max() > 1e-5


@pytest.mark.skipif(not REF_OK, reason="reference build unavailable")
def test_reference_parity(variant_rt, tmp_path):
    name, model, rt = variant_rt
    ref = _ref_embd(model, tmp_path / "e.bin", IDS)
    ours = rt.embed(IDS, "none")
    assert ref.shape == ours.shape
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / max(scale, 1e-6)
    assert err < 0.02, f"{name}: rel err {err:.4f}"


@pytest.mark.skipif(not REF_OK, reason="reference build unavailable")
def test_reference_parity_base_bert(tmp_path):
    model = make_tiny_bert_gguf(tmp_path / "b.gguf", seed=21)
    rt = Runtime.from_gguf(model)
    ref = _ref_embd(model, tmp_path / "e.bin", IDS)
    ours = rt.embed(IDS, "none")
    scale = np.abs(ref).max()
    err = np.abs(ref - ours).max() / max(scale, 1e-6)
    assert err < 0.02, f"bert: rel err {err:.4f}"
