"""T5 encoder-decoder + UGM tokenizer tests: unit behavior plus cross-engine
parity against the reference build via the llama_encode + greedy-decode
harness (tools/golden_gen/gen_logits_t5.c).
"""
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_tiny_t5_gguf
from test_cross_engine import LDPATH, REFBUILD, ref_available

GEN_T5 = Path("/tmp/gen_logits_t5")


def build_gen_t5():
    if GEN_T5.exists():
        return True
    src = Path(__file__).parent.parent / "tools/golden_gen/gen_logits_t5.c"
    r = subprocess.run(
        ["g++", "-O2", "-I/root/reference/include", "-I/root/reference/ggml/include",
         str(src), f"-L{REFBUILD}/src", f"-L{REFBUILD}/ggml/src",
         "-lllama", "-lggml", "-lm", "-o", str(GEN_T5)],
        capture_output=True)
    return r.returncode == 0


needs_ref = pytest.mark.skipif(
    not (ref_available and build_gen_t5()), reason="reference build unavailable")


def ref_t5(model_path, prompt, n_gen=6):
    import os
    out = Path("/tmp") / (Path(model_path).stem + "_t5_logits.bin")
    env = dict(os.environ, LD_LIBRARY_PATH=LDPATH)
    r = subprocess.run([str(GEN_T5), str(model_path), str(out), prompt, str(n_gen)],
                       env=env, capture_output=True)
    assert r.returncode == 0, r.stderr.decode()[-500:]
    raw = out.read_bytes()
    n_enc, n_dec, n_vocab, n_embd = struct.unpack("<IIII", raw[:16])
    off = 16
    enc_ids = np.frombuffer(raw, np.int32, n_enc, off); off += 4 * n_enc
    dec_ids = np.frombuffer(raw, np.int32, n_dec, off); off += 4 * n_dec
    enc_hidden = np.frombuffer(raw, np.float32, n_enc * n_embd, off).reshape(
        n_enc, n_embd); off += 4 * n_enc * n_embd
    logits = np.frombuffer(raw, np.float32, n_dec * n_vocab, off)
    return enc_ids, dec_ids, enc_hidden, logits.reshape(n_dec, n_vocab)


# ------------------------------------------------------------- unit tests
def test_rel_bucket_matches_reference_formula():
    """Vectorized buckets == scalar port of llama_relative_position_bucket."""
    from ik_llama_cpp_tpu.models.t5 import rel_bucket
    import math

    def ref(x, n_buckets, bidirectional):
        max_distance = 128
        nb = n_buckets
        if bidirectional:
            nb >>= 1
        max_exact = nb >> 1
        rp = x
        bucket = 0
        if bidirectional:
            bucket += (rp > 0) * nb
            rp = abs(rp)
        else:
            rp = -min(rp, 0)
        if rp < max_exact:
            return bucket + rp
        large = math.floor(max_exact + math.log(max(rp, 1) / max_exact)
                           * (nb - max_exact) / math.log(max_distance / max_exact))
        return bucket + min(large, nb - 1)

    xs = np.arange(-300, 300)
    for bidir in (True, False):
        got = np.asarray(rel_bucket(xs, 32, bidir))
        want = np.asarray([ref(int(x), 32, bidir) for x in xs])
        np.testing.assert_array_equal(got, want)


def test_ugm_tokenizer_roundtrip(tmp_path):
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.runtime.tokenizer import tokenizer_from_gguf
    model = make_tiny_t5_gguf(tmp_path / "t5.gguf", seed=50)
    tok = tokenizer_from_gguf(load_gguf(model).metadata)
    ids = tok.encode(" Hello world this is a test")
    assert ids[-1] == 1        # UGM appends EOS
    text = tok.decode(ids[:-1])
    assert "Hello" in text and "world" in text
    # word pieces preferred over char-by-char (6 words + eos)
    assert len(ids) <= 8


def test_t5_generate_smoke(tmp_path):
    from ik_llama_cpp_tpu.runtime.t5_runtime import T5Runtime
    model = make_tiny_t5_gguf(tmp_path / "t5.gguf", seed=50)
    rt = T5Runtime.from_gguf(model)
    enc = rt.encode("Hello world")
    assert enc.shape[-1] == 64 and np.isfinite(enc).all()
    _, out = rt.generate_greedy("Hello world", max_new_tokens=4)
    _, out2 = rt.generate_greedy("Hello world", max_new_tokens=4)
    assert out == out2


# ------------------------------------------------------------ parity
@needs_ref
@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_and_tokenizer_parity(tmp_path, gated):
    """T5 (relu-seq) and flan-T5 (gelu-gated) vs the reference: UGM
    tokenization + full encoder (relative-bucket bias, post-LN-free RMS
    stack) match the reference's llama_encode result_norm output.

    The DECODER cannot be parity-tested against this fork: its V-cache
    readback is broken — llm_build_kv_store writes V rows contiguously but
    build_t5_decoder reads the old transposed view (element_size*n_ctx
    strides, build_t5.cpp:172-176), so only the first element of each value
    head survives; the fork also feeds the DECODER's wq/wk/wv into the
    encoder (fixture writes identical q/k/v to both stacks to keep encoder
    parity meaningful). Our decoder follows upstream T5 semantics and is
    covered by test_t5_generate_smoke + the oracle-checked rel buckets."""
    from ik_llama_cpp_tpu.runtime.t5_runtime import T5Runtime
    model = make_tiny_t5_gguf(tmp_path / "t5.gguf", seed=51, gated=gated)
    prompt = "Hello world, this is a test of the quick brown fox"
    enc_ids, dec_ids, ref_hidden, _ref_logits = ref_t5(model, prompt, n_gen=6)
    rt = T5Runtime.from_gguf(model)
    ours = rt.tokenizer.encode(prompt)
    assert ours == list(enc_ids), (ours, list(enc_ids))
    enc_out = rt.encode(list(enc_ids))
    err = np.abs(enc_out - ref_hidden)
    # bf16 matmuls vs the reference's f32: relu kinks let worst-case single
    # coordinates drift ~0.1 on unit-rms hiddens; the mean tracks closely
    assert err.mean() < 0.02, f"encoder hidden mean abs diff {err.mean():.4f}"
    assert err.max() < 0.25, f"encoder hidden max abs diff {err.max():.4f}"
