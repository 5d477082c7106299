"""Sequence/context parallelism: ring attention + sp prefill
(ops/ring_attention.py, parallel/sp.py)."""
import tempfile
from pathlib import Path
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from fixtures import make_tiny_llama_gguf
from ik_llama_cpp_tpu.gguf.reader import load_gguf
from ik_llama_cpp_tpu.models import llama as llama_mod
from ik_llama_cpp_tpu.models.config import config_from_gguf
from ik_llama_cpp_tpu.models.llama import KVCache
from ik_llama_cpp_tpu.ops.ring_attention import ring_attend
from ik_llama_cpp_tpu.parallel import sp


def _ref_attn(q, k, v, scale, softcap=0.0, swa_window=0):
    """Plain causal softmax attention oracle (B, T, H, D), GQA via repeat."""
    b, t, h, d = q.shape
    hkv = k.shape[2]
    kk = jnp.repeat(k, h // hkv, axis=2).astype(jnp.float32)
    vv = jnp.repeat(v, h // hkv, axis=2).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, kk)
    if softcap > 0:
        s = jnp.tanh(s / softcap) * softcap
    qpos = jnp.arange(t)[:, None]
    kpos = jnp.arange(t)[None, :]
    mask = kpos <= qpos
    if swa_window > 0:
        mask &= kpos >= qpos - (swa_window - 1)
    s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vv)


@pytest.mark.parametrize("softcap,swa", [(0.0, 0), (8.0, 0), (0.0, 6)])
def test_ring_attend_matches_oracle(softcap, swa):
    rng = np.random.default_rng(0)
    b, t, h, hkv, d = 2, 16, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ref = _ref_attn(q, k, v, scale, softcap, swa)

    mesh = sp.make_seq_mesh(4)
    f = shard_map(
        partial(ring_attend, axis=sp.SEQ_AXIS, scale=scale,
                softcap=softcap, swa_window=swa),
        mesh=mesh,
        in_specs=(P(None, sp.SEQ_AXIS), P(None, sp.SEQ_AXIS),
                  P(None, sp.SEQ_AXIS)),
        out_specs=P(None, sp.SEQ_AXIS),
        check_rep=False)
    got = jax.jit(f)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def _llama8():
    path = Path(tempfile.gettempdir()) / "pp_tiny_llama8.gguf"
    if not path.exists():
        make_tiny_llama_gguf(path, seed=3, n_layer=8)
    gg = load_gguf(path)
    cfg = config_from_gguf(gg.metadata)
    return cfg, llama_mod.load_llama_params(gg, cfg)


def _close(got, ref):
    """Bar as in test_pipeline: argmax equality + tight tolerances, against
    a JITTED single-device reference (jit-vs-eager bf16 fusion noise would
    otherwise dominate near-ties on the tiny random model)."""
    got, ref = np.asarray(got), np.asarray(ref)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=0.25)


def _jit_fwd(cfg, params, tokens, kv, n_past):
    f = jax.jit(partial(llama_mod.forward, cfg=cfg))
    return f(params, tokens=tokens, kv=kv, n_past=jnp.int32(n_past))


def test_sp_prefill_matches_single_device():
    cfg, params = _llama8()
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(3, 250, size=(1, 32)), jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 64)
    ref_logits, _ = _jit_fwd(cfg, params, tokens, kv_ref, 0)
    mesh = sp.make_seq_mesh(4)
    prefill = sp.make_sp_prefill(cfg, mesh, params)
    kv = KVCache.create(cfg, 1, 64)
    logits, kv = prefill(params, tokens, kv, 0)
    _close(logits, ref_logits)


def test_sp_prefill_then_decode():
    """Decode continues from an sp-built cache after gather_cache."""
    cfg, params = _llama8()
    rng = np.random.default_rng(2)
    t = 32
    tokens = jnp.asarray(rng.integers(3, 250, size=(1, t)), jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 64)
    _, kv_ref = _jit_fwd(cfg, params, tokens, kv_ref, 0)
    step = jnp.array([[111]], jnp.int32)
    ref_logits, _ = _jit_fwd(cfg, params, step, kv_ref, t)

    mesh = sp.make_seq_mesh(4)
    prefill = sp.make_sp_prefill(cfg, mesh, params)
    kv = KVCache.create(cfg, 1, 64)
    _, kv = prefill(params, tokens, kv, 0)
    kv = sp.gather_cache(jax.device_put(kv, jax.devices()[0]), t, 64, 4)
    # cache contents must match the single-device prefill rows
    np.testing.assert_allclose(
        np.asarray(kv.k[:, :, :t], jnp.float32),
        np.asarray(kv_ref.k[:, :, :t], jnp.float32), rtol=2e-2, atol=2e-2)
    got, _ = _jit_fwd(cfg, params, step, kv, t)
    _close(got, ref_logits)


def test_sp_prefill_quant_kv():
    """Quantize-on-write lands in the shard-local cache rows too."""
    cfg, params = _llama8()
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(3, 250, size=(1, 16)), jnp.int32)

    kv_ref = KVCache.create(cfg, 1, 32, quant=True)
    ref_logits, _ = _jit_fwd(cfg, params, tokens, kv_ref, 0)
    mesh = sp.make_seq_mesh(2)
    prefill = sp.make_sp_prefill(cfg, mesh, params)
    kv = KVCache.create(cfg, 1, 32, quant=True)
    logits, kv = prefill(params, tokens, kv, 0)
    _close(logits, ref_logits)
