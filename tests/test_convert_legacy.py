"""Legacy Meta-LLaMA (.pth) converter test: synthesize a 2-shard
consolidated checkpoint, convert with a donor-GGUF vocab, load, generate,
and check the shard-merge axes."""
import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fixtures import make_tiny_llama_gguf  # noqa: E402
from ik_llama_cpp_tpu.tools.convert_legacy import convert  # noqa: E402

DIM, NH, NKV, NL, FF = 32, 4, 2, 2, 96


def write_meta_checkpoint(d, vocab=259, shards=2, seed=0):
    rng = np.random.default_rng(seed)

    def t(*s):
        return torch.from_numpy((rng.standard_normal(s) * 0.05
                                 ).astype(np.float32))

    kv_dim = DIM * NKV // NH
    full = {"tok_embeddings.weight": t(vocab, DIM),
            "norm.weight": torch.ones(DIM),
            "output.weight": t(vocab, DIM)}
    for il in range(NL):
        p = f"layers.{il}."
        full[p + "attention.wq.weight"] = t(DIM, DIM)
        full[p + "attention.wk.weight"] = t(kv_dim, DIM)
        full[p + "attention.wv.weight"] = t(kv_dim, DIM)
        full[p + "attention.wo.weight"] = t(DIM, DIM)
        full[p + "attention_norm.weight"] = torch.ones(DIM)
        full[p + "feed_forward.w1.weight"] = t(FF, DIM)
        full[p + "feed_forward.w2.weight"] = t(DIM, FF)
        full[p + "feed_forward.w3.weight"] = t(FF, DIM)
        full[p + "ffn_norm.weight"] = torch.ones(DIM)
    (d / "params.json").write_text(json.dumps(
        {"dim": DIM, "n_layers": NL, "n_heads": NH, "n_kv_heads": NKV,
         "norm_eps": 1e-5, "vocab_size": vocab}))
    from ik_llama_cpp_tpu.tools.convert_legacy import _SHARD_AXIS, _stem
    for si in range(shards):
        shard = {}
        for name, w in full.items():
            axis = _SHARD_AXIS.get(_stem(name))
            if axis is None:
                shard[name] = w
            else:
                shard[name] = torch.chunk(w, shards, dim=axis)[si]
        torch.save(shard, d / f"consolidated.{si:02d}.pth")
    return full


def test_convert_merge_load_generate(tmp_path):
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.weights import dequant_tensor
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    donor = make_tiny_llama_gguf(tmp_path / "donor.gguf", seed=1)
    full = write_meta_checkpoint(tmp_path, shards=2)
    out = convert(str(tmp_path), str(tmp_path / "legacy.gguf"),
                  vocab_gguf=str(donor))
    gg = load_gguf(out)
    # shard merge must reproduce the unsharded tensors exactly
    got = dequant_tensor(gg.tensors["blk.0.attn_output.weight"])
    np.testing.assert_array_equal(
        got.reshape(DIM, DIM),
        full["layers.0.attention.wo.weight"].numpy())
    got = dequant_tensor(gg.tensors["blk.1.ffn_down.weight"])
    np.testing.assert_array_equal(
        got.reshape(DIM, FF), full["layers.1.feed_forward.w2.weight"].numpy())
    rt = Runtime.from_gguf(out)
    assert rt.cfg.n_head_kv == NKV and rt.cfg.n_ff == FF
    _, gen = rt.generate([1, 5, 6], 6, seed=0)
    assert len(gen) == 6
