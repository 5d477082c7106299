"""--swa-compress: ring caches on sliding-window layers (reference
llama.cpp:1198-1227 row_count plan / compacted SWA cache).

Parity contract: the ring stores exactly the keys the window mask would
keep, with per-slot absolute positions recovered in attention, so outputs
match the full cache."""
import numpy as np
import jax.numpy as jnp
import pytest

from fixtures import make_tiny_gptoss_gguf
from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.models.llama import KVCache, SwaKVCache


@pytest.fixture(scope="module")
def rts(tmp_path_factory):
    p = make_tiny_gptoss_gguf(tmp_path_factory.mktemp("swac") / "m.gguf",
                              seed=12)
    return Runtime.from_gguf(p), Runtime.from_gguf(p, swa_compress=True)


def test_cache_shapes_and_memory(rts):
    rt_f, rt_c = rts
    assert rt_c.needs_n_valid
    kv_f = rt_f.new_cache(1, 1024)
    kv_c = rt_c.new_cache(1, 1024)
    assert isinstance(kv_f, KVCache) and isinstance(kv_c, SwaKVCache)
    assert kv_c.swa_cap < kv_c.capacity
    bytes_f = kv_f.k.size + kv_f.v.size
    bytes_c = (kv_c.k_full.size + kv_c.v_full.size
               + kv_c.k_swa.size + kv_c.v_swa.size)
    assert bytes_c < bytes_f
    # small capacities where compression can't help fall back to the
    # full cache (reference: "--swa-compress had no effect" warning)
    assert isinstance(rt_c.new_cache(1, 128), KVCache)


def test_swa_compress_logit_parity(rts):
    """Long prompt wrapping the ring several times: argmax parity with the
    full cache at every position (same math, permuted storage)."""
    rt_f, rt_c = rts
    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(3, 250, 700)]
    lf = rt_f.all_position_logits(ids, capacity=1024)
    lc = rt_c.all_position_logits(ids, capacity=1024)
    assert np.all(np.isfinite(lc))
    agree = (lf.argmax(-1) == lc.argmax(-1)).mean()
    assert agree > 0.99, f"argmax agreement {agree:.2%}"
    np.testing.assert_allclose(lc, lf, rtol=2e-2, atol=2e-2)


def test_swa_compress_decode_across_wrap(rts):
    """Greedy decode continuing past the ring boundary matches full cache."""
    rt_f, rt_c = rts
    rng = np.random.default_rng(1)
    ids = [int(x) for x in rng.integers(3, 250, 620)]
    outs = []
    for rt in rts:
        kv = rt.new_cache(1, 1024)
        logits, kv, n_past = rt.eval_tokens(ids, kv, 0)
        toks = [int(np.argmax(logits[-1]))]
        for _ in range(6):
            logits, kv, n_past = rt.eval_tokens([toks[-1]], kv, n_past)
            toks.append(int(np.argmax(logits[-1])))
        outs.append(toks)
    assert outs[0] == outs[1]
