"""Layer-split pipeline parallelism (-sm layer analogue, parallel/pp.py).

Equality bar: the SPLIT itself is lossless — an eager-mode stage chain is
bit-identical to the eager full forward (test_stage_chain_bit_exact).
The jitted PipelineRunner additionally picks up XLA fusion-level bf16
rounding differences (exactly as jit(full) differs from eager(full)), so
runner tests assert argmax equality + tight logit tolerances, mirroring
tests/test_sharding.py's bar for -sm graph.
"""
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_tiny_llama_gguf, make_tiny_gemma_gguf
from ik_llama_cpp_tpu.gguf.reader import load_gguf
from ik_llama_cpp_tpu.models import llama as llama_mod
from ik_llama_cpp_tpu.models.config import config_from_gguf
from ik_llama_cpp_tpu.models.llama import KVCache
from ik_llama_cpp_tpu.parallel import pp


def _load(path_maker, name, **kw):
    path = Path(tempfile.gettempdir()) / name
    if not path.exists():
        path_maker(path, **kw)
    gg = load_gguf(path)
    cfg = config_from_gguf(gg.metadata)
    params = llama_mod.load_llama_params(gg, cfg)
    return cfg, params


def _llama8():
    return _load(make_tiny_llama_gguf, "pp_tiny_llama8.gguf",
                 seed=3, n_layer=8)


def _close(got, ref):
    got, ref = np.asarray(got), np.asarray(ref)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=0.25)


def test_stage_bounds():
    assert pp.stage_bounds(8, 4) == [(0, 2), (2, 4), (4, 6), (6, 8)]
    assert pp.stage_bounds(7, 4) == [(0, 2), (2, 4), (4, 6), (6, 7)]
    # tensor-split-style proportions: 3x memory on device 0
    assert pp.stage_bounds(8, 2, split=[3.0, 1.0]) == [(0, 6), (6, 8)]
    # every stage keeps >= 1 layer even under extreme ratios
    b = pp.stage_bounds(4, 3, split=[100.0, 1.0, 1.0])
    assert [hi - lo for lo, hi in b] == [2, 1, 1]


def test_split_merge_cache_roundtrip():
    cfg, _ = _llama8()
    kv = KVCache.create(cfg, 2, 32, quant=True)
    kv = KVCache(jnp.arange(np.prod(kv.k.shape), dtype=jnp.int8)
                 .reshape(kv.k.shape) % 100, kv.v, kv.k_scale, kv.v_scale)
    bounds = pp.stage_bounds(cfg.n_layer, 3)
    back = pp.merge_cache(pp.split_cache(kv, bounds))
    np.testing.assert_array_equal(np.asarray(back.k), np.asarray(kv.k))
    assert back.k_scale is not None


def test_stage_chain_bit_exact():
    """The layer split is numerically lossless: an eager stage chain equals
    the eager full forward bit for bit (the jitted runner only adds the
    usual jit-vs-eager fusion rounding)."""
    cfg, params = _llama8()
    tokens = jnp.array([[3, 17, 9, 200, 42, 7, 11, 5]], dtype=jnp.int32)
    kv = KVCache.create(cfg, 1, 32)
    ref, kv_ref = llama_mod.forward(params, cfg, tokens, kv, jnp.int32(0))

    bounds = pp.stage_bounds(cfg.n_layer, 4)
    sps = pp.split_stage_params(params, bounds)
    kvs = pp.split_cache(KVCache.create(cfg, 1, 32), bounds)
    stream = None
    for s, (lo, hi) in enumerate(bounds):
        last = s == len(bounds) - 1
        stream, kvs[s] = llama_mod.forward(
            sps[s], cfg, tokens, kvs[s], jnp.int32(0), layer_offset=lo,
            return_raw_stream=not last, inputs_embeds=stream)
    np.testing.assert_array_equal(np.asarray(stream), np.asarray(ref))
    merged = pp.merge_cache(kvs)
    np.testing.assert_array_equal(np.asarray(merged.k), np.asarray(kv_ref.k))


@pytest.mark.parametrize("n_stages", [2, 4])
def test_pipeline_matches_single_device(n_stages):
    cfg, params = _llama8()
    tokens = jnp.array([[3, 17, 9, 200, 42, 7, 11, 5]], dtype=jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 32)
    ref_logits, _ = llama_mod.forward(params, cfg, tokens, kv_ref,
                                      jnp.int32(0))
    runner = pp.PipelineRunner(cfg, params,
                               devices=jax.devices()[:n_stages])
    kvs = runner.init_cache(1, 32)
    got, kvs = runner(tokens, kvs, jnp.int32(0))
    _close(got, ref_logits)


def test_pipeline_decode_after_prefill():
    cfg, params = _llama8()
    prompt = jnp.array([[3, 17, 9, 200, 42, 7, 11, 5]], dtype=jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 32)
    _, kv_ref = llama_mod.forward(params, cfg, prompt, kv_ref, jnp.int32(0))
    step = jnp.array([[123]], dtype=jnp.int32)
    ref_logits, _ = llama_mod.forward(params, cfg, step, kv_ref,
                                      jnp.int32(prompt.shape[1]))

    runner = pp.PipelineRunner(cfg, params, n_stages=4)
    kvs = runner.init_cache(1, 32)
    _, kvs = runner(prompt, kvs, jnp.int32(0))
    got, kvs = runner(step, kvs, jnp.int32(prompt.shape[1]))
    _close(got, ref_logits)


def test_pipeline_chunked_prefill():
    cfg, params = _llama8()
    prompt = jnp.array([[3, 17, 9, 200, 42, 7, 11, 5]], dtype=jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 32)
    ref_logits, _ = llama_mod.forward(params, cfg, prompt, kv_ref,
                                      jnp.int32(0))

    runner = pp.PipelineRunner(cfg, params, n_stages=2)
    kvs = runner.init_cache(1, 32)
    logits, kvs = runner.prefill_chunked(prompt, kvs, 0, chunk=4)
    # last chunk's logits == reference logits for those positions
    _close(logits, np.asarray(ref_logits)[:, 4:])


def test_pipeline_quant_kv_and_logits_last_only():
    cfg, params = _llama8()
    tokens = jnp.array([[3, 17, 9, 200]], dtype=jnp.int32)
    kv_ref = KVCache.create(cfg, 1, 32, quant=True)
    ref_logits, _ = llama_mod.forward(params, cfg, tokens, kv_ref,
                                      jnp.int32(0), logits_last_only=True)
    runner = pp.PipelineRunner(cfg, params, n_stages=2,
                               logits_last_only=True)
    kvs = runner.init_cache(1, 32, quant=True)
    got, kvs = runner(tokens, kvs, jnp.int32(0))
    assert got.shape[1] == 1
    assert kvs[0].k_scale is not None
    _close(got, ref_logits)


def test_pipeline_gemma_embd_scale_once():
    """Regression: the gemma embedding scale must be applied exactly once
    (stage 0), not re-applied when later stages consume the stream via
    inputs_embeds."""
    cfg, params = _load(make_tiny_gemma_gguf, "pp_tiny_gemma.gguf", seed=5)
    assert cfg.embd_scale > 0
    tokens = jnp.array([[3, 17, 9, 20]], dtype=jnp.int32)
    kv_ref = KVCache.create(cfg, 1, 32)
    ref_logits, _ = llama_mod.forward(params, cfg, tokens, kv_ref,
                                      jnp.int32(0))
    runner = pp.PipelineRunner(cfg, params, n_stages=2)
    kvs = runner.init_cache(1, 32)
    got, _ = runner(tokens, kvs, jnp.int32(0))
    _close(got, ref_logits)


def test_runtime_layer_split_generate():
    """Runtime.from_gguf(layer_split=4): the full generate() path (tokenize,
    bucketed prefill, host decode loop) over 4 pipeline stages produces the
    same tokens as the single-device runtime."""
    from ik_llama_cpp_tpu.runtime.generate import Runtime

    path = Path(tempfile.gettempdir()) / "pp_tiny_llama8.gguf"
    if not path.exists():
        make_tiny_llama_gguf(path, seed=3, n_layer=8)
    rt1 = Runtime.from_gguf(path)
    rtp = Runtime.from_gguf(path, layer_split=4)
    assert rtp.pp_runner is not None and rtp.pp_runner.n_stages == 4
    ids, out1 = rt1.generate([3, 17, 9, 200], max_new_tokens=8)
    _, outp = rtp.generate([3, 17, 9, 200], max_new_tokens=8)
    assert out1 == outp
    # greedy-on-device entrypoint transparently falls back under -sm layer
    _, outg = rtp.generate_greedy_on_device([3, 17, 9, 200],
                                            max_new_tokens=8)
    assert outg == out1


def test_pipeline_state_save_restore(tmp_path):
    """Session files written under -sm layer are layout-neutral: a pipelined
    session saves, a pipelined (or single-chip) session restores."""
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    from ik_llama_cpp_tpu.runtime.state import load_state, save_state

    path = Path(tempfile.gettempdir()) / "pp_tiny_llama8.gguf"
    if not path.exists():
        make_tiny_llama_gguf(path, seed=3, n_layer=8)
    rtp = Runtime.from_gguf(path, layer_split=2)
    ids = [3, 17, 9, 200]
    kvs = rtp.new_cache(1, 64)
    logits, kvs, n_past = rtp.eval_tokens(ids, kvs, 0)
    sf = tmp_path / "pp.state"
    save_state(sf, ids, n_past, kvs)

    kvs2 = rtp.new_cache(1, 64)
    toks, n2, kvs2 = load_state(sf, kvs2)
    assert toks == ids and n2 == n_past and isinstance(kvs2, list)
    l2, kvs2, _ = rtp.eval_tokens([123], kvs2, n2)
    lr, kvs, _ = rtp.eval_tokens([123], kvs, n_past)
    np.testing.assert_array_equal(l2, lr)

    # the same file restores into a single-chip cache
    rt1 = Runtime.from_gguf(path)
    kv1 = rt1.new_cache(1, 64)
    toks1, n1, kv1 = load_state(sf, kv1)
    assert toks1 == ids and n1 == n_past
    l1, kv1, _ = rt1.eval_tokens([123], kv1, n1)
    np.testing.assert_array_equal(np.asarray(l1).argmax(-1),
                                  np.asarray(lr).argmax(-1))


def test_kshift_per_stage_matches_full():
    """Context-shift under -sm layer: shifting each stage's layer slice with
    layer_offset equals shifting the whole cache (SWA layers rope-shift at
    their own base, so the absolute index matters)."""
    from ik_llama_cpp_tpu.runtime.kshift import k_shift

    cfg, params = _load(make_tiny_gemma_gguf, "pp_tiny_gemma.gguf", seed=5)
    if not (cfg.swa_window > 0 and cfg.swa_layer_mask):
        pytest.skip("fixture lacks SWA layers")
    rng = np.random.default_rng(0)
    L, B, S, H, D = cfg.n_layer, 1, 32, cfg.n_head_kv, cfg.head_dim
    kv = KVCache(
        jnp.asarray(rng.standard_normal((L, B, S, H, D)), jnp.bfloat16),
        jnp.asarray(rng.standard_normal((L, B, S, H, D)), jnp.bfloat16))
    full, np_full = k_shift(kv, cfg, 4, 8, jnp.int32(28))

    bounds = pp.stage_bounds(L, 2)
    parts = pp.split_cache(kv, bounds)
    shifted = []
    for (lo, _hi), part in zip(bounds, parts):
        out, np_part = k_shift(part, cfg, 4, 8, jnp.int32(28),
                               layer_offset=lo)
        shifted.append(out)
    assert int(np_part) == int(np_full)
    merged = pp.merge_cache(shifted)
    np.testing.assert_array_equal(
        np.asarray(merged.k, np.float32), np.asarray(full.k, np.float32))
    np.testing.assert_array_equal(
        np.asarray(merged.v, np.float32), np.asarray(full.v, np.float32))


@pytest.mark.parametrize("n_stages,tp", [(2, 2), (4, 2)])
def test_pipeline_tp_composition(n_stages, tp):
    """pp x tp: layer ranges across stage submeshes, tensors split within
    each stage (2-D pipe x model sharding)."""
    cfg, params = _llama8()
    tokens = jnp.array([[3, 17, 9, 200, 42, 7, 11, 5]], dtype=jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 32)
    ref_logits, kv_ref = llama_mod.forward(params, cfg, tokens, kv_ref,
                                           jnp.int32(0))
    runner = pp.PipelineRunner(cfg, params, n_stages=n_stages, tp=tp)
    assert runner.n_stages == n_stages
    kvs = runner.init_cache(1, 32)
    got, kvs = runner(tokens, kvs, jnp.int32(0))
    _close(got, ref_logits)

    # decode step continues from the stage caches
    step = jnp.array([[123]], dtype=jnp.int32)
    ref2, _ = llama_mod.forward(params, cfg, step, kv_ref, jnp.int32(8))
    got2, kvs = runner(step, kvs, jnp.int32(8))
    _close(got2, ref2)
