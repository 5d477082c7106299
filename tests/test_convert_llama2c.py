"""llama2.c checkpoint importer test: fabricate a karpathy-format
checkpoint + tokenizer.bin, convert to GGUF, load, and generate — plus a
numerical parity check of the imported forward against a direct numpy
reimplementation of llama2.c's run.c math."""
import struct

import numpy as np
import pytest

from ik_llama_cpp_tpu.tools.convert_llama2c import (convert, read_checkpoint,
                                                    read_tokenizer_bin)

DIM, HID, NL, NH, NKV, V, SEQ = 32, 64, 2, 4, 2, 64, 128


def write_fake_llama2c(tmp_path, shared=True, seed=0):
    rng = np.random.default_rng(seed)
    kv_dim = DIM * NKV // NH

    def r(*s):
        return (rng.standard_normal(s) * 0.05).astype(np.float32)

    blocks = [
        r(V, DIM),                    # token embedding
        np.ones((NL, DIM), np.float32),     # rms_att
        r(NL, DIM, DIM), r(NL, kv_dim, DIM), r(NL, kv_dim, DIM),
        r(NL, DIM, DIM),              # wq wk wv wo
        np.ones((NL, DIM), np.float32),     # rms_ffn
        r(NL, HID, DIM), r(NL, DIM, HID), r(NL, HID, DIM),  # w1 w2 w3
        np.ones(DIM, np.float32),     # rms_final
        np.zeros(SEQ * (DIM // NH), np.float32),   # legacy freq_cis
    ]
    if not shared:
        blocks.append(r(V, DIM))
    ckpt = tmp_path / "model.bin"
    with open(ckpt, "wb") as f:
        f.write(struct.pack("<7i", DIM, HID, NL, NH, NKV,
                            V if shared else -V, SEQ))
        for b in blocks:
            f.write(np.ascontiguousarray(b).tobytes())
    tok = tmp_path / "tokenizer.bin"
    with open(tok, "wb") as f:
        f.write(struct.pack("<i", 8))
        names = ["<unk>", "<s>", "</s>"] + \
            [f"<0x{i:02X}>" for i in range(32)] + \
            [f"tok{i}" for i in range(V - 35)]
        for i, t in enumerate(names):
            raw = t.encode()
            f.write(struct.pack("<fi", float(-i), len(raw)))
            f.write(raw)
    return ckpt, tok


@pytest.mark.parametrize("shared", [True, False])
def test_roundtrip_header_and_weights(tmp_path, shared):
    ckpt, tok = write_fake_llama2c(tmp_path, shared=shared)
    cfg, w = read_checkpoint(str(ckpt))
    assert cfg == dict(dim=DIM, hidden_dim=HID, n_layers=NL, n_heads=NH,
                       n_kv_heads=NKV, vocab_size=V, seq_len=SEQ)
    assert w["wk"].shape == (NL, DIM * NKV // NH, DIM)
    assert (w["wcls"] is w["tok_embd"]) == shared
    tokens, scores, types = read_tokenizer_bin(str(tok), V)
    assert tokens[1] == "<s>" and types[1] == 3
    assert types[3] == 6 and tokens[3] == "<0x00>"


def test_convert_load_generate(tmp_path):
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    ckpt, tok = write_fake_llama2c(tmp_path)
    out = convert(str(ckpt), str(tok), str(tmp_path / "m.gguf"))
    rt = Runtime.from_gguf(out)
    assert rt.cfg.n_layer == NL and rt.cfg.n_head_kv == NKV
    ids, gen = rt.generate([1, 40, 41, 42], 8, seed=0)
    assert len(gen) == 8 and all(0 <= t < V for t in gen)


def test_forward_parity_with_run_c_math(tmp_path):
    """One decode step must match a direct numpy transcription of run.c."""
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    ckpt, tok = write_fake_llama2c(tmp_path)
    out = convert(str(ckpt), str(tok), str(tmp_path / "m.gguf"))
    rt = Runtime.from_gguf(out)
    cfg, w = read_checkpoint(str(ckpt))
    prompt = [1, 40, 41, 42, 50]
    kv = rt.new_cache(1, 64)
    logits, _, _ = rt.eval_tokens(prompt, kv, 0)

    # ---- numpy run.c
    hd = DIM // NH
    kv_dim = DIM * NKV // NH
    rep = NH // NKV

    def rms(x, g):
        return x / np.sqrt((x * x).mean() + 1e-5) * g

    def rope(x, pos):   # adjacent-pair rotation, llama2.c run.c:285
        y = x.reshape(-1, hd).astype(np.float64)
        half = np.arange(hd // 2)
        freq = 1.0 / (10000.0 ** (2 * half / hd))
        a = pos * freq
        c, s = np.cos(a), np.sin(a)
        out = y.copy()
        out[:, 0::2] = y[:, 0::2] * c - y[:, 1::2] * s
        out[:, 1::2] = y[:, 0::2] * s + y[:, 1::2] * c
        return out.reshape(-1)

    ks = [np.zeros((0, kv_dim))] * NL
    vs = [np.zeros((0, kv_dim))] * NL
    for pos, t in enumerate(prompt):
        x = w["tok_embd"][t].astype(np.float64)
        for il in range(NL):
            xb = rms(x, w["rms_att"][il])
            q = rope(w["wq"][il] @ xb, pos)
            k = rope(w["wk"][il] @ xb, pos)
            v = w["wv"][il] @ xb
            ks[il] = np.vstack([ks[il], k])
            vs[il] = np.vstack([vs[il], v])
            attn = np.zeros(DIM)
            for h in range(NH):
                qh = q[h * hd:(h + 1) * hd]
                kvh = h // rep
                kh = ks[il][:, kvh * hd:(kvh + 1) * hd]
                vh = vs[il][:, kvh * hd:(kvh + 1) * hd]
                sc = kh @ qh / np.sqrt(hd)
                p = np.exp(sc - sc.max())
                p /= p.sum()
                attn[h * hd:(h + 1) * hd] = p @ vh
            x = x + w["wo"][il] @ attn
            xb = rms(x, w["rms_ffn"][il])
            g = w["w1"][il] @ xb
            g = g / (1 + np.exp(-g)) * (w["w3"][il] @ xb)
            x = x + w["w2"][il] @ g
        ref = w["wcls"] @ rms(x, w["rms_final"])
    np.testing.assert_allclose(logits[-1], ref, atol=2e-2, rtol=1e-2)
    assert int(np.argmax(logits[-1])) == int(np.argmax(ref))
