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


def test_gguf_split_merge_roundtrip(tmp_path):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.tools.gguf_split import split_gguf, merge_gguf
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    import numpy as np

    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=3)
    parts = split_gguf(model, tmp_path / "shard", max_tensors=5)
    assert len(parts) > 1
    # loader follows split naming transparently
    gg = load_gguf(parts[0])
    orig = load_gguf(model)
    assert set(gg.tensors) == set(orig.tensors)

    merged = merge_gguf(parts[0], tmp_path / "merged.gguf")
    gg2 = load_gguf(merged)
    for name in orig.tensors:
        assert np.array_equal(np.asarray(gg2.tensors[name].data),
                              np.asarray(orig.tensors[name].data)), name


def test_gguf_hash(tmp_path):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.tools.gguf_hash import hash_gguf

    a = make_tiny_llama_gguf(tmp_path / "a.gguf", seed=3)
    b = make_tiny_llama_gguf(tmp_path / "b.gguf", seed=4)
    ha, hb = hash_gguf(a), hash_gguf(b)
    assert ha["__model__"] != hb["__model__"]
    assert ha["token_embd.weight"] != hb["token_embd.weight"]
    # determinism
    assert hash_gguf(a)["__model__"] == ha["__model__"]


def test_kl_divergence_self_is_zero(tmp_path):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.tools.perplexity import save_logits, kl_divergence

    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=5)
    rt = Runtime.from_gguf(model)
    text = "the quick brown fox jumps over the lazy dog " * 30
    base = save_logits(rt, text, str(tmp_path / "base.npz"), n_ctx=64, n_chunks=2)
    res = kl_divergence(rt, base, verbose=False)
    assert res["kld_mean"] < 5e-3          # self-KLD ~ 0 (f16 logit storage)
    assert res["same_top_p"] > 0.99
    assert abs(res["ppl_ours"] / res["ppl_base"] - 1.0) < 1e-3


def test_hellaswag_scoring(tmp_path):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.tools.perplexity import hellaswag_score

    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=6)
    rt = Runtime.from_gguf(model)
    tasks = [
        {"query": "the sky is", "choices": ["blue", "a dog", "running", "of"],
         "gold": 0},
        {"query": "one two", "choices": ["three", "banana", "the", "zzz"],
         "gold": 0},
    ]
    acc = hellaswag_score(rt, tasks, verbose=False)
    assert 0.0 <= acc <= 100.0             # random tiny model: just sanity


def test_passkey_prompt_roundtrip():
    from ik_llama_cpp_tpu.tools.passkey import build_prompt
    p = build_prompt(12345, n_junk=10, pos_frac=0.5)
    assert "12345" in p and p.endswith("The pass key is")


def test_timings():
    import io
    from ik_llama_cpp_tpu.runtime.timings import Timings
    t = Timings()
    with t.load():
        pass
    with t.prompt(10):
        pass
    with t.eval(5):
        pass
    d = t.as_dict()
    assert d["n_prompt"] == 10 and d["n_eval"] == 5
    buf = io.StringIO()
    t.print(file=buf)
    assert "prompt eval time" in buf.getvalue()


def test_eval_callback_dump(tmp_path, capsys):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.tools.eval_callback import main as ec_main
    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=3)
    out = tmp_path / "dump.npz"
    ec_main(["-m", str(model), "-p", "hi there", "-o", str(out)])
    import numpy as np
    data = np.load(out)
    assert "l_out-0" in data and "result_output" in data
    assert data["l_out-0"].shape[-1] == 64


def test_layer_similarity(tmp_path):
    from fixtures import make_tiny_llama_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.tools.imatrix import layer_similarity
    model = make_tiny_llama_gguf(tmp_path / "m.gguf", seed=3)
    rt = Runtime.from_gguf(model)
    sims = layer_similarity(rt, "the quick brown fox jumps")
    assert len(sims) == rt.cfg.n_layer
    assert all(-1.0 <= s <= 1.001 for s in sims)


def test_webui_served(tmp_path):
    from ik_llama_cpp_tpu.server.app import Server
    from pathlib import Path
    html = (Path("ik_llama_cpp_tpu/server/webui.html")).read_text()
    assert "/v1/chat/completions" in html
    # multi-view SPA (reference public/ WebUI family parity): chat + pad
    # (mikupad analogue) + metrics dashboard + tokenizer playground
    for marker in ("v-chat", "v-pad", "v-metrics", "v-tokens",
                   "/completion", "/metrics", "/slots", "/tokenize",
                   "grammar_kind", "reasoning_content", "tool_calls",
                   "dry_multiplier", "mirostat"):
        assert marker in html, marker
