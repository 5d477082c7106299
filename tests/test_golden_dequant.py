"""Bit-exact decode parity against the reference C implementation.

Golden files (tests/golden/*.bin) were produced by the reference's own
quantize_row_* / dequantize_row_* via tools/golden_gen/gen_golden.c. Our
dequantizers must reproduce the reference dequantization of reference-encoded
data EXACTLY (bit-for-bit f32) — this is the foundation of PPL parity.
"""
import struct
from pathlib import Path

import numpy as np
import pytest

from ik_llama_cpp_tpu.gguf.constants import GGMLType, GEOMETRY
from ik_llama_cpp_tpu.quant.dequant import DEQUANT_FNS, dequantize
from ik_llama_cpp_tpu.quant.planar import PLANAR_FNS, planar_decode

GOLDEN_DIR = Path(__file__).parent / "golden"

NAME_TO_TYPE = {
    "q4_0": GGMLType.Q4_0, "q4_1": GGMLType.Q4_1, "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1, "q6_0": GGMLType.Q6_0, "q8_0": GGMLType.Q8_0,
    "mxfp4": GGMLType.MXFP4,
    "q2_K": GGMLType.Q2_K, "q3_K": GGMLType.Q3_K, "q4_K": GGMLType.Q4_K,
    "q5_K": GGMLType.Q5_K, "q6_K": GGMLType.Q6_K,
    "iq4_nl": GGMLType.IQ4_NL, "iq4_xs": GGMLType.IQ4_XS,
    "iq2_k": GGMLType.IQ2_K, "iq2_ks": GGMLType.IQ2_KS, "iq2_kl": GGMLType.IQ2_KL,
    "iq3_k": GGMLType.IQ3_K, "iq3_ks": GGMLType.IQ3_KS,
    "iq4_k": GGMLType.IQ4_K, "iq4_ks": GGMLType.IQ4_KS, "iq4_kss": GGMLType.IQ4_KSS,
    "iq5_k": GGMLType.IQ5_K, "iq5_ks": GGMLType.IQ5_KS, "iq6_k": GGMLType.IQ6_K,
    "iq1_kt": GGMLType.IQ1_KT, "iq2_kt": GGMLType.IQ2_KT, "iq3_kt": GGMLType.IQ3_KT,
    "iq4_kt": GGMLType.IQ4_KT, "q8_KV": GGMLType.Q8_KV,
}


def load_golden(name):
    raw = (GOLDEN_DIR / f"{name}.bin").read_bytes()
    n_rows, n_per_row = struct.unpack("<II", raw[:8])
    row_bytes = struct.unpack("<Q", raw[8:16])[0]
    off = 16
    qbytes = np.frombuffer(raw, dtype=np.uint8, count=n_rows * row_bytes, offset=off)
    off += n_rows * row_bytes
    deq = np.frombuffer(raw, dtype=np.float32, count=n_rows * n_per_row, offset=off)
    return n_rows, n_per_row, row_bytes, qbytes, deq.reshape(n_rows, n_per_row)


goldens = sorted(p.stem for p in GOLDEN_DIR.glob("*.bin")
                 if not p.stem.startswith("decode_")) if GOLDEN_DIR.exists() else []


@pytest.mark.skipif(not goldens, reason="golden files not generated")
@pytest.mark.parametrize("name", goldens)
def test_dequant_bit_exact(name):
    ttype = NAME_TO_TYPE[name]
    n_rows, n_per_row, row_bytes, qbytes, ref = load_golden(name)
    assert GEOMETRY[ttype].row_bytes(n_per_row) == row_bytes, "geometry mismatch"
    got = dequantize(qbytes, ttype, n_per_row)
    np.testing.assert_array_equal(
        got.view(np.uint32), ref.view(np.uint32),
        err_msg=f"{name}: dequant differs from reference C implementation",
    )


@pytest.mark.skipif(not goldens, reason="golden files not generated")
@pytest.mark.parametrize("name", [g for g in goldens if NAME_TO_TYPE[g] in PLANAR_FNS])
def test_planar_bit_exact(name):
    ttype = NAME_TO_TYPE[name]
    _, n_per_row, _, qbytes, ref = load_golden(name)
    pw = planar_decode(qbytes, ttype, n_per_row)
    got = pw.dequant()
    # planar collapses value*sign into int8 codes, which cannot represent -0.0;
    # compare as floats (±0 equal), still exact everywhere else
    np.testing.assert_array_equal(
        got, ref, err_msg=f"{name}: planar decode differs from reference",
    )


DECODE_ONLY = {
    "decode_iq2_xxs": GGMLType.IQ2_XXS, "decode_iq2_xs": GGMLType.IQ2_XS,
    "decode_iq2_s": GGMLType.IQ2_S, "decode_iq3_xxs": GGMLType.IQ3_XXS,
    "decode_iq3_s": GGMLType.IQ3_S, "decode_iq1_s": GGMLType.IQ1_S,
    "decode_iq1_m": GGMLType.IQ1_M,
}

decode_goldens = sorted(p.stem for p in GOLDEN_DIR.glob("decode_*.bin")) \
    if GOLDEN_DIR.exists() else []


@pytest.mark.skipif(not decode_goldens, reason="decode goldens not generated")
@pytest.mark.parametrize("name", decode_goldens)
def test_iquant_decode_bit_exact(name):
    """Codebook i-quants: random-byte encodings decoded by the reference C
    implementation must match ours bit-for-bit."""
    ttype = DECODE_ONLY[name]
    n_rows, n_per_row, row_bytes, qbytes, ref = load_golden(name)
    assert GEOMETRY[ttype].row_bytes(n_per_row) == row_bytes
    got = dequantize(qbytes, ttype, n_per_row)
    np.testing.assert_array_equal(
        got.view(np.uint32), ref.view(np.uint32),
        err_msg=f"{name}: dequant differs from reference")
