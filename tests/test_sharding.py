"""Tensor-parallel forward over a virtual 8-device CPU mesh must match the
single-device forward exactly (same math, different partitioning)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.gguf.reader import load_gguf
from ik_llama_cpp_tpu.models.config import config_from_gguf
from ik_llama_cpp_tpu.models import llama as llama_mod
from ik_llama_cpp_tpu.models.llama import KVCache
from ik_llama_cpp_tpu.parallel.mesh import make_mesh, shard_params
from ik_llama_cpp_tpu.parallel.tp import make_tp_forward

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = make_tiny_llama_gguf(
        tmp_path_factory.mktemp("m") / "tiny8.gguf",
        n_layer=2, n_embd=64, n_head=8, n_head_kv=8, n_ff=128, seed=3)
    gg = load_gguf(path)
    cfg = config_from_gguf(gg.metadata)
    params = llama_mod.load_llama_params(gg, cfg)
    return cfg, params


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)])
def test_tp_matches_single_device(tiny, mesh_shape):
    cfg, params = tiny
    dp = mesh_shape[0]
    mesh = make_mesh(mesh_shape)
    sparams = shard_params(params, mesh)

    b, t, cap = dp, 8, 32
    tokens = jnp.asarray(np.random.default_rng(0).integers(3, 250, (b, t), np.int32))
    kv0 = KVCache.create(cfg, b, cap)

    ref_logits, ref_kv = jax.jit(
        lambda p, tk, kv: llama_mod.forward(p, cfg, tk, kv, jnp.int32(0))
    )(params, tokens, kv0)

    fwd = make_tp_forward(cfg, mesh, sparams)
    got_logits, got_kv = fwd(sparams, tokens, kv0, jnp.int32(0))

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    # greedy tokens must agree exactly
    np.testing.assert_array_equal(np.asarray(got_logits).argmax(-1),
                                  np.asarray(ref_logits).argmax(-1))


def test_tp_decode_step_after_prefill(tiny):
    cfg, params = tiny
    mesh = make_mesh((1, 8))
    sparams = shard_params(params, mesh)
    fwd = make_tp_forward(cfg, mesh, sparams)

    tokens = jnp.asarray([[5, 6, 7, 8]], dtype=jnp.int32)
    kv = KVCache.create(cfg, 1, 32)
    logits, kv = fwd(sparams, tokens, kv, jnp.int32(0))
    nxt = jnp.asarray([[int(np.asarray(logits)[0, -1].argmax())]], dtype=jnp.int32)
    logits2, kv = fwd(sparams, nxt, kv, jnp.int32(4))
    assert np.isfinite(np.asarray(logits2)).all()


@pytest.fixture(scope="module")
def tiny_moe(tmp_path_factory):
    from fixtures import make_tiny_moe_gguf
    path = make_tiny_moe_gguf(
        tmp_path_factory.mktemp("moe") / "moe8.gguf",
        n_layer=2, n_embd=64, n_head=8, n_head_kv=8,
        n_expert=8, n_expert_used=2, n_ff_exp=64, seed=4)
    gg = load_gguf(path)
    cfg = config_from_gguf(gg.metadata)
    params = llama_mod.load_llama_params(gg, cfg)
    return cfg, params


def _single_device_ref(cfg, params, tokens, kv0):
    return jax.jit(
        lambda p, tk, kv: llama_mod.forward(p, cfg, tk, kv, jnp.int32(0))
    )(params, tokens, kv0)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (1, 2, 4), (1, 4, 2), (2, 2, 2)])
def test_moe_tp_ep_matches_single_device(tiny_moe, mesh_shape):
    """MoE under intra-expert TP and whole-expert EP (data, expert, model)
    must reproduce single-device logits."""
    cfg, params = tiny_moe
    dp = mesh_shape[0]
    mesh = make_mesh(mesh_shape)
    sparams = shard_params(params, mesh)

    b, t, cap = dp, 8, 32
    tokens = jnp.asarray(np.random.default_rng(1).integers(3, 250, (b, t), np.int32))
    kv0 = KVCache.create(cfg, b, cap)

    ref_logits, _ = _single_device_ref(cfg, params, tokens, kv0)
    fwd = make_tp_forward(cfg, mesh, sparams)
    got_logits, _ = fwd(sparams, tokens, kv0, jnp.int32(0))

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    assert np.array_equal(np.asarray(got_logits).argmax(-1),
                          np.asarray(ref_logits).argmax(-1))


def test_runtime_tensor_parallel(tmp_path):
    """Runtime.from_gguf(tensor_parallel=8) must match the single-chip
    runtime (the -sm graph serving path)."""
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    path = make_tiny_llama_gguf(tmp_path / "tp.gguf",
                                n_layer=2, n_embd=64, n_head=8, n_head_kv=8,
                                n_ff=128, seed=13)
    rt1 = Runtime.from_gguf(path)
    rt8 = Runtime.from_gguf(path, tensor_parallel=8)
    ids = rt1.tokenizer.encode("hello sharded world")
    a = rt1.all_position_logits(ids, capacity=64)
    b = rt8.all_position_logits(ids, capacity=64)
    assert np.array_equal(a.argmax(-1), b.argmax(-1))
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)


def test_deepseek2_mla_tp(tmp_path):
    """DeepSeek2 MLA latent-ABSORB under TP: wk_b/wv_b shard on the head
    axis, the compressed latent cache is replicated per shard — must match
    single-chip absorb logits (the reference's
    distribute_mla_tensors_for_split_mode_graph + replicated_k_l)."""
    from fixtures import make_tiny_deepseek2_gguf
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    path = make_tiny_deepseek2_gguf(tmp_path / "ds2tp.gguf", n_head=4, seed=17)
    rt1 = Runtime.from_gguf(path)                      # single-chip absorb
    assert "wk_b" in rt1.params["blocks"][0]
    rt4 = Runtime.from_gguf(path, tensor_parallel=4)   # TP absorb
    assert "wk_b" in rt4.params["blocks"][0]
    kv = rt4.new_cache(1, 64)
    assert kv.k.shape[3] == 1, "TP must serve the latent cache, not full-KV"
    ids = rt1.tokenizer.encode("hello sharded latent world")
    a = rt1.all_position_logits(ids, capacity=64)
    b = rt4.all_position_logits(ids, capacity=64)
    assert np.array_equal(a.argmax(-1), b.argmax(-1))
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)
