"""Gemma4 MTP / assistant draft tier (build_gemma4.cpp:533-905): load,
target-cache cross-attention drafting, assistant tensor-name variant, and
registry coverage — the last 2 of the reference's 84 architectures."""
import numpy as np
import pytest

from fixtures import make_tiny_gemma4_gguf, make_tiny_gemma4_mtp_gguf


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.config import config_from_gguf
    from ik_llama_cpp_tpu.models import gemma4 as G4
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    d = tmp_path_factory.mktemp("g4mtp")
    tgt_path = make_tiny_gemma4_gguf(d / "target.gguf")
    mtp_path = make_tiny_gemma4_mtp_gguf(d / "mtp.gguf")

    rt = Runtime.from_gguf(str(tgt_path))
    gg = load_gguf(mtp_path)
    mcfg = config_from_gguf(gg.metadata)
    mparams = G4.load_gemma4_mtp_params(gg, mcfg, use_quant=False)

    # target prefill with hidden-state export
    prompt = [3, 7, 11, 5, 9, 2, 8, 4]
    toks = jnp.asarray([prompt], jnp.int32)
    kv = rt.new_cache(1, 64)
    hidden, kv = G4.forward(rt.params, rt.cfg, toks, kv, 0,
                            return_hidden=True)
    return rt, mcfg, mparams, G4, prompt, hidden, kv


def test_config_parses(setup):
    rt, mcfg, *_ = setup
    assert mcfg.arch == "gemma4_mtp"
    assert mcfg.extra["mtp_backbone_n_embd"] == 64
    assert mcfg.layer_is_swa(0) and not mcfg.layer_is_swa(1)


def test_draft_logits_shapes_and_sensitivity(setup):
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.models.gemma4 import gemma4_mtp_forward
    rt, mcfg, mparams, G4, prompt, hidden, kv = setup
    n = len(prompt)
    toks = jnp.asarray([[prompt[-1]]], jnp.int32)
    h_last = hidden[:, -1:, :]
    logits, embd = gemma4_mtp_forward(
        mparams, mcfg, toks, h_last, kv, n - 1, n, rt.cfg,
        target_tok_embd=rt.params['tok_embd'])
    assert logits.shape == (1, 1, mcfg.n_vocab)
    assert embd.shape == (1, 1, 64)
    assert np.isfinite(np.asarray(logits)).all()

    # the seed token must influence the draft (pre-projection wiring)
    logits2, _ = gemma4_mtp_forward(
        mparams, mcfg, jnp.asarray([[5]], jnp.int32), h_last, kv,
        n - 1, n, rt.cfg, target_tok_embd=rt.params['tok_embd'])
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))

    # the target hidden state must influence the draft
    logits3, _ = gemma4_mtp_forward(
        mparams, mcfg, toks, h_last * 1.5, kv, n - 1, n, rt.cfg,
        target_tok_embd=rt.params['tok_embd'])
    assert not np.allclose(np.asarray(logits), np.asarray(logits3))

    # the target KV cache must influence the draft (frozen cross-attention)
    import jax
    kv2 = jax.tree_util.tree_map(lambda a: a * 1.3, kv)
    logits4, _ = gemma4_mtp_forward(
        mparams, mcfg, toks, h_last, kv2, n - 1, n, rt.cfg,
        target_tok_embd=rt.params['tok_embd'])
    assert not np.allclose(np.asarray(logits), np.asarray(logits4))


def test_chained_mtp_drafting(setup):
    """Multi-step draft: feed mtp_embd back as the next hidden state
    (common_speculative_state_mtp chained decode)."""
    import jax.numpy as jnp
    from ik_llama_cpp_tpu.models.gemma4 import gemma4_mtp_forward
    rt, mcfg, mparams, G4, prompt, hidden, kv = setup
    n = len(prompt)
    h = hidden[:, -1:, :]
    tok = jnp.asarray([[prompt[-1]]], jnp.int32)
    drafted = []
    for step in range(4):
        logits, h = gemma4_mtp_forward(
            mparams, mcfg, tok, h, kv, n - 1 + step, n, rt.cfg,
            target_tok_embd=rt.params['tok_embd'])
        nxt = int(np.asarray(logits)[0, -1].argmax())
        drafted.append(nxt)
        tok = jnp.asarray([[nxt]], jnp.int32)
    assert len(drafted) == 4
    assert all(0 <= t < mcfg.n_vocab for t in drafted)


def test_assistant_variant_loads(tmp_path):
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.config import config_from_gguf
    from ik_llama_cpp_tpu.models import gemma4 as G4
    p = make_tiny_gemma4_mtp_gguf(tmp_path / "asst.gguf", assistant=True)
    gg = load_gguf(p)
    cfg = config_from_gguf(gg.metadata)
    assert cfg.arch == "gemma4-assistant"
    assert cfg.extra["mtp_backbone_n_embd"] == 64
    params = G4.load_gemma4_mtp_params(gg, cfg, use_quant=False)
    assert "mtp_pre_proj" in params and len(params["blocks"]) == 2


def test_registry_rejects_standalone_decode(tmp_path):
    from ik_llama_cpp_tpu.runtime.generate import FORWARDS, LOADERS
    assert "gemma4_mtp" in FORWARDS and "gemma4-assistant" in LOADERS
    with pytest.raises(RuntimeError, match="TARGET gemma4"):
        FORWARDS["gemma4_mtp"](None, None, None, None, None)


def test_gptj_registered_as_vestigial():
    """84/84: gptj exists in the reference arch table but has no tensor map
    beyond token_embd and no graph builder — loading fails there too."""
    from ik_llama_cpp_tpu.runtime.generate import FORWARDS
    assert "gptj" in FORWARDS
    with pytest.raises(NotImplementedError, match="vestigial"):
        FORWARDS["gptj"]()
