"""Native C++ planar decoder must be bit-identical to the Python oracle,
on both random bytes and reference-encoded golden data."""
from pathlib import Path

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType, GEOMETRY
from ik_llama_cpp_tpu.native import NATIVE_FNS, available, build, planar_decode_native
from ik_llama_cpp_tpu.quant.planar import planar_decode

if not available():
    build()

pytestmark = pytest.mark.skipif(not available(), reason="libplanar.so not built")

NPR = 512


@pytest.mark.parametrize("ttype", sorted(NATIVE_FNS, key=int), ids=lambda t: t.name)
def test_native_matches_python(ttype):
    rng = np.random.default_rng(int(ttype) + 99)
    rb = GEOMETRY[ttype].row_bytes(NPR)
    raw = rng.integers(0, 256, size=(4, rb), dtype=np.uint8)
    ref = planar_decode(raw, ttype, NPR)
    got = planar_decode_native(raw, ttype, NPR)
    assert got is not None
    codes, scale, bias, group = got
    assert group == ref.group
    np.testing.assert_array_equal(codes, ref.codes)
    mask = np.isfinite(ref.scale)
    np.testing.assert_array_equal(scale[mask], ref.scale[mask])
    if ref.bias is not None:
        mask = np.isfinite(ref.bias)
        np.testing.assert_array_equal(bias[mask], ref.bias[mask])


def test_native_on_golden_q4k():
    golden = Path(__file__).parent / "golden/q4_K.bin"
    if not golden.exists():
        pytest.skip("no golden")
    import struct
    raw = golden.read_bytes()
    n_rows, n_per_row = struct.unpack("<II", raw[:8])
    rb = struct.unpack("<Q", raw[8:16])[0]
    qb = np.frombuffer(raw, np.uint8, n_rows * rb, 16)
    deq_ref = np.frombuffer(raw, np.float32, n_rows * n_per_row,
                            16 + n_rows * rb).reshape(n_rows, n_per_row)
    codes, scale, bias, group = planar_decode_native(qb, GGMLType.Q4_K, n_per_row)
    y = codes.astype(np.float32) * np.repeat(scale, group, axis=1) \
        + np.repeat(bias, group, axis=1)
    np.testing.assert_array_equal(y, deq_ref)


def test_native_speedup():
    """Sanity: native decode should beat numpy by a wide margin on big input."""
    import time
    rng = np.random.default_rng(0)
    n, rows = 4096, 256
    rb = GEOMETRY[GGMLType.Q4_K].row_bytes(n)
    raw = rng.integers(0, 256, size=(rows, rb), dtype=np.uint8)
    def best(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(raw, GGMLType.Q4_K, n)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_py = best(planar_decode)
    t_nat = best(planar_decode_native)
    assert t_nat < t_py, (t_nat, t_py)


def test_native_spm_matches_python_oracle():
    """libspm.so bigram merge must be id-identical to the Python
    _spm_encode_piece oracle on the real llama SPM vocab, including byte
    fallback and multibyte characters."""
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.native import spm_available
    from ik_llama_cpp_tpu.runtime.tokenizer import tokenizer_from_gguf
    if not spm_available():
        from ik_llama_cpp_tpu.native import build
        assert build(), "libspm.so build failed"
    tok = tokenizer_from_gguf(
        load_gguf("/root/reference/models/ggml-vocab-llama-spm.gguf").metadata)
    cases = [
        "Hello world", "  leading spaces", "emoji 🚀🦙 mix",
        "日本語のテキスト", "tab\tand\nnewline", "x" * 500,
        "the quick brown fox jumps over the lazy dog " * 40,
        "ünïcödé àccénts", "", "a",
    ]
    for text in cases:
        fast = tok.encode(text)
        tok._native_spm = False       # force the Python oracle
        slow = tok.encode(text)
        tok._native_spm = None        # retry native next case
        assert fast == slow, (text[:40], fast[:10], slow[:10])
