"""Tool-level tests: quantize CLI (incl. cross-engine readback of our encoded
files), quantize-stats, imatrix collect/save/load round-trip."""
import os
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.gguf.reader import load_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.tools.quantize import quantize_model
from ik_llama_cpp_tpu.tools.quantize_stats import run as qstats_run
from ik_llama_cpp_tpu.tools.imatrix import collect_imatrix, save_imatrix, load_imatrix

REFBUILD = Path("/tmp/refbuild")
LDPATH = f"{REFBUILD}/src:{REFBUILD}/ggml/src"


@pytest.fixture(scope="module")
def f16_model(tmp_path_factory):
    return make_tiny_llama_gguf(
        tmp_path_factory.mktemp("q") / "base_f16.gguf",
        n_embd=256, n_ff=512, quant=GGMLType.F16, seed=9)


def test_quantize_q4km(f16_model, tmp_path):
    out = tmp_path / "q4km.gguf"
    quantize_model(f16_model, out, "Q4_K_M", verbose=False)
    gg = load_gguf(out)
    assert gg.get("blk.1.ffn_up.weight").ggml_type == GGMLType.Q4_K
    assert gg.get("blk.0.attn_v.weight").ggml_type == GGMLType.Q6_K  # bump rule
    assert gg.get("output.weight").ggml_type == GGMLType.Q6_K
    assert gg.get("blk.0.attn_norm.weight").ggml_type == GGMLType.F32
    assert out.stat().st_size < Path(f16_model).stat().st_size * 0.55
    # still generates
    rt = Runtime.from_gguf(out)
    _, toks = rt.generate("test", max_new_tokens=3, stop_at_eos=False)
    assert len(toks) == 3


def test_quantize_custom_q(f16_model, tmp_path):
    out = tmp_path / "custom.gguf"
    quantize_model(f16_model, out, "Q4_K_S",
                   custom_q=r"ffn_down=Q8_0,attn_q\.weight=Q6_0", verbose=False)
    gg = load_gguf(out)
    assert gg.get("blk.0.ffn_down.weight").ggml_type == GGMLType.Q8_0
    assert gg.get("blk.0.attn_q.weight").ggml_type == GGMLType.Q6_0
    assert gg.get("blk.0.ffn_up.weight").ggml_type == GGMLType.Q4_K


@pytest.mark.skipif(not (REFBUILD / "src/libllama.so").exists(),
                    reason="reference build unavailable")
def test_reference_engine_reads_our_quantized_file(f16_model, tmp_path):
    """The reference engine must load and run a GGUF quantized BY US."""
    out = tmp_path / "ours_q4km.gguf"
    quantize_model(f16_model, out, "Q4_K_M", verbose=False)
    env = dict(os.environ, LD_LIBRARY_PATH=LDPATH)
    r = subprocess.run(
        ["/tmp/gen_logits", str(out), str(tmp_path / "lg.bin"), "Hello", "2"],
        env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-400:]


def test_quantize_stats(f16_model):
    rows, overall = qstats_run(f16_model, GGMLType.Q4_K, verbose=False)
    assert rows and 0 < overall < 0.05


def test_imatrix_roundtrip(f16_model, tmp_path):
    rt = Runtime.from_gguf(f16_model)
    text = "The quick brown fox jumps over the lazy dog. " * 30
    stats, ncall = collect_imatrix(rt, text, n_ctx=64, n_chunks=2, verbose=False)
    assert "blk.0.attn_q.weight" in stats
    assert stats["blk.0.ffn_down.weight"].shape == (512,)
    path = tmp_path / "im.dat"
    save_imatrix(path, {k: (v, ncall) for k, v in stats.items()}, ncall, "cal.txt")
    loaded = load_imatrix(path)
    np.testing.assert_allclose(loaded["blk.0.attn_q.weight"],
                               stats["blk.0.attn_q.weight"] / ncall, rtol=1e-6)


def test_quantize_with_imatrix(f16_model, tmp_path):
    rt = Runtime.from_gguf(f16_model)
    text = "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " * 30
    stats, ncall = collect_imatrix(rt, text, n_ctx=64, n_chunks=2, verbose=False)
    im = tmp_path / "im.dat"
    save_imatrix(im, {k: (v, ncall) for k, v in stats.items()}, ncall, "")
    out = tmp_path / "q4_im.gguf"
    quantize_model(f16_model, out, "Q4_K_S", imatrix_path=im, verbose=False)
    rt2 = Runtime.from_gguf(out)
    _, toks = rt2.generate("test", max_new_tokens=2, stop_at_eos=False)
    assert len(toks) == 2
