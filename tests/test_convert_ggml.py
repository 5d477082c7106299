"""Legacy GGML/GGMF/GGJT -> GGUF converter tests (the analogue of the
reference's convert_llama_ggml_to_gguf.py).

A synthetic GGJTv3 file is serialized from scratch (magic, 7-u32 header,
scored vocab, 32B-aligned tensor records), converted, and the result must
load through Runtime and produce the SAME logits as a directly-written
GGUF of identical weights (quantized payloads pass through raw)."""
import struct

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GEOMETRY, GGMLType
from ik_llama_cpp_tpu.quant.quantize import quantize
from ik_llama_cpp_tpu.tools.convert_ggml import LegacyGGML, convert

N_EMBD, N_HEAD, N_LAYER, N_FF = 64, 4, 2, 96


def _vocab(n=259 + 8):
    """id 0-2 specials, 3..258 single bytes, then a few words."""
    items = [b"<unk>", b"<s>", b"</s>"]
    items += [bytes([b]) for b in range(256)]
    items += [b" hello", b" world", b" the", b" quick", b" brown",
              b" fox", b" a", b" b"]
    return items[:n]


def _tiny_weights(rng):
    """{meta name: f32 array (n_out, n_in)} for a 2-layer tiny llama."""
    n_vocab = len(_vocab())

    def r(o, i, s=None):
        return (rng.standard_normal((o, i)) * (s or i ** -0.5)) \
            .astype(np.float32)

    wt = {b"tok_embeddings.weight": r(n_vocab, N_EMBD, 0.5),
          b"norm.weight": np.ones((N_EMBD,), np.float32),
          b"output.weight": r(n_vocab, N_EMBD)}
    for il in range(N_LAYER):
        p = f"layers.{il}.".encode()
        wt[p + b"attention.wq.weight"] = r(N_EMBD, N_EMBD)
        wt[p + b"attention.wk.weight"] = r(N_EMBD, N_EMBD)
        wt[p + b"attention.wv.weight"] = r(N_EMBD, N_EMBD)
        wt[p + b"attention.wo.weight"] = r(N_EMBD, N_EMBD)
        wt[p + b"feed_forward.w1.weight"] = r(N_FF, N_EMBD)
        wt[p + b"feed_forward.w2.weight"] = r(N_EMBD, N_FF)
        wt[p + b"feed_forward.w3.weight"] = r(N_FF, N_EMBD)
        wt[p + b"attention_norm.weight"] = np.ones((N_EMBD,), np.float32)
        wt[p + b"ffn_norm.weight"] = np.ones((N_EMBD,), np.float32)
        # inference-only extra every real checkpoint carries — must be skipped
        wt[p + b"attention.inner_attention.rope.freqs"] = \
            np.ones((N_EMBD // N_HEAD // 2,), np.float32)
    return wt


def _write_legacy(path, wt, *, magic=b"tjgg", version=3, ftype=2,
                  scored=True, padded=True):
    """Serialize a legacy-container model file."""
    n_vocab = len(_vocab())
    out = bytearray()
    out += magic
    if magic != b"lmgg":
        out += struct.pack("<I", version)
    out += struct.pack("<7I", n_vocab, N_EMBD, 256, N_HEAD, N_LAYER,
                       N_EMBD // N_HEAD, ftype)
    for tok in _vocab():
        out += struct.pack("<I", len(tok)) + tok
        if scored:
            out += struct.pack("<f", -1.0)
    for name, arr in wt.items():
        if ftype == 2 and arr.ndim == 2 and arr.shape[-1] % 32 == 0 \
                and b"norm" not in name and b"rope" not in name:
            ty, payload = GGMLType.Q4_0, quantize(arr, GGMLType.Q4_0).tobytes()
        else:
            ty, payload = GGMLType.F32, arr.astype(np.float32).tobytes()
        dims = tuple(reversed(arr.shape))        # ggml ne order
        out += struct.pack("<3I", arr.ndim, len(name), int(ty))
        out += struct.pack(f"<{arr.ndim}I", *dims)
        out += name
        if padded:
            out += b"\0" * (-len(out) & 31)
        out += payload
    path.write_bytes(bytes(out))
    return path


def test_parse_ggjt3(tmp_path):
    wt = _tiny_weights(np.random.default_rng(0))
    p = _write_legacy(tmp_path / "m.bin", wt)
    m = LegacyGGML(p.read_bytes())
    assert m.fmt == 2 and m.version == 3 and m.ftype == 2
    assert m.n_embd == N_EMBD and m.n_layer == N_LAYER and m.n_ff == N_FF
    assert len(m.vocab) == len(_vocab())
    names = {t["name"] for t in m.tensors}
    assert b"layers.1.feed_forward.w2.weight" in names


def test_convert_matches_direct_gguf(tmp_path):
    """Converted GGUF loads and generates identically to a directly-written
    GGUF holding the same (quantized) payloads."""
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.weights import dequant_tensor
    from ik_llama_cpp_tpu.runtime.generate import Runtime

    rng = np.random.default_rng(1)
    wt = _tiny_weights(rng)
    legacy = _write_legacy(tmp_path / "m.bin", wt)
    out = convert(legacy, tmp_path / "m.gguf")

    gg = load_gguf(out)
    assert gg.metadata["general.architecture"] == "llama"
    assert gg.metadata["llama.feed_forward_length"] == N_FF
    # raw Q4_0 passthrough: dequant of the converted tensor == dequant of a
    # fresh quantization of the same weights
    t = gg.tensors["blk.0.attn_q.weight"]
    assert t.ggml_type == GGMLType.Q4_0
    got = dequant_tensor(t)
    ref = dequant_tensor_like(wt[b"layers.0.attention.wq.weight"])
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # rope.freqs extras must not leak through
    assert not any("rope" in n for n in gg.tensors)

    rt = Runtime.from_gguf(out)
    ids, toks = rt.generate("hello world", 4, seed=0)
    assert len(toks) == 4


def dequant_tensor_like(arr):
    from ik_llama_cpp_tpu.quant.dequant import dequantize
    q = quantize(arr, GGMLType.Q4_0)
    return dequantize(q.reshape(arr.shape[0], -1), GGMLType.Q4_0, arr.shape[-1]).reshape(arr.shape)


def test_vocab_fixups(tmp_path):
    wt = _tiny_weights(np.random.default_rng(2))
    out = convert(_write_legacy(tmp_path / "m.bin", wt), tmp_path / "m.gguf")
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    md = load_gguf(out).metadata
    toks = md["tokenizer.ggml.tokens"]
    types = md["tokenizer.ggml.token_type"]
    assert toks[0] == "<unk>" and types[0] == 2
    assert toks[1] == "<s>" and types[1] == 3
    assert toks[3] == "<0x00>" and types[3] == 6      # byte token renamed
    assert toks[260].startswith("▁")             # ' hello' -> ▁hello
    assert md["tokenizer.ggml.bos_token_id"] == 1


def test_eligibility_rules(tmp_path):
    wt = _tiny_weights(np.random.default_rng(3))
    # GGJTv2 Q4_0: blocked (Q4/Q8 blocks changed in v3)
    p = _write_legacy(tmp_path / "v2.bin", wt, version=2)
    with pytest.raises(ValueError, match="GGJTv3"):
        convert(p, tmp_path / "v2.gguf")
    # GGMF quantized: blocked (everything changed in GGJTv2)
    p = _write_legacy(tmp_path / "f.bin", wt, magic=b"fmgg", version=1,
                      padded=False)
    with pytest.raises(ValueError, match="GGJTv2"):
        convert(p, tmp_path / "f.gguf")
    # GGML v0 F32 (unscored vocab, unpadded): allowed
    p = _write_legacy(tmp_path / "v0.bin", wt, magic=b"lmgg", ftype=0,
                      scored=False, padded=False)
    out = convert(p, tmp_path / "v0.gguf")
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    assert load_gguf(out).tensors["blk.0.attn_q.weight"].ggml_type \
        == GGMLType.F32


def test_rejects_gguf_and_garbage(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"GGUF" + b"\0" * 64)
    with pytest.raises(ValueError, match="already a GGUF"):
        convert(p, tmp_path / "x.gguf")
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        convert(p, tmp_path / "x.gguf")
