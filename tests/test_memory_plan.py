"""HBM capacity planner: the giant-MoE fits-and-runs story for 16 GB v5e.

The reference serves DeepSeek-R1 671B with hybrid CPU+GPU offload
(BASELINE.md, discussions/223); the TPU answer is quantized weights +
tensor/expert parallel sharding. These tests pin the planner's math and
prove the proposed sharding actually compiles and runs (scaled-down R1
geometry on a virtual mesh)."""
import numpy as np
import pytest

from ik_llama_cpp_tpu.tools.memory_plan import (
    PRESETS, SCHEMES, plan, ModelShape)


def test_r1_fits_pod_slice():
    p = plan(PRESETS["deepseek-r1"], "int4", ctx=16384)
    assert p["fits"] and p["chips"] <= 32
    assert p["per_chip_gib"] < 16 * 0.92
    # MLA latent cache: ~35 KB/token vs ~1.4 MB/token for 128-head GQA
    # at the same dims — the "163,840-token ctx fits only with MLA" line
    assert p["kv_bytes_per_token"] < 40_000


def test_qwen3_moe_single_chip_int4():
    p = plan(PRESETS["qwen3-30b-a3b"], "int4", ctx=8192)
    assert p["fits"] and p["chips"] <= 2
    p8 = plan(PRESETS["qwen3-30b-a3b"], "int8", ctx=8192)
    assert p8["chips"] <= 4


def test_llama8b_single_chip():
    for scheme in ("int8", "int4", "i8mxu"):
        p = plan(PRESETS["llama-8b"], scheme, ctx=8192)
        assert p["fits"] and p["chips"] == 1, (scheme, p)


def test_param_count_sanity():
    # presets must reproduce the models' advertised sizes within ~5%
    for name, total_b in (("deepseek-r1", 671), ("qwen3-30b-a3b", 30.5),
                          ("llama-8b", 8.0)):
        got = sum(PRESETS[name].weight_params().values()) / 1e9
        assert abs(got - total_b) / total_b < 0.06, (name, got)


def test_r1_scaled_down_runs_under_tp():
    """Scaled-down R1 geometry (same ratios: MLA + leading dense + MoE with
    shared expert) must load and run under the planner's TP sharding on a
    virtual mesh — the end-to-end half of the capacity story."""
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from fixtures import make_tiny_deepseek2_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    p = make_tiny_deepseek2_gguf("/tmp/r1_scaled.gguf", seed=4)
    rt = Runtime.from_gguf(p, tensor_parallel=4)
    ids = rt.tokenizer.encode("the quick brown fox")
    logits = rt.all_position_logits(ids)
    assert np.all(np.isfinite(logits))
    # must match the single-chip engine
    rt1 = Runtime.from_gguf(p)
    l1 = rt1.all_position_logits(ids)
    agree = (logits.argmax(-1) == l1.argmax(-1)).mean()
    assert agree > 0.95, f"TP vs single-chip argmax {agree:.2%}"
