"""Registry-based HF -> GGUF converters (tools/convert_hf_archs.py):
convert a tiny randomly-initialized transformers model, load the GGUF in
our engine, and require logit parity with the HF torch forward — the same
bar as tests/test_convert_hf.py. One test per added HF architecture
(reference: convert_hf_to_gguf.py register classes)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ik_llama_cpp_tpu.runtime.generate import Runtime
from ik_llama_cpp_tpu.tools.convert_hf import convert


def _sm(x):
    x = np.asarray(x, np.float64)
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def _parity(hf_cfg_cls, hf_model_cls, tmp_path, name, ids=None, tol=0.15,
            seed=0, **cfg_kw):
    d = tmp_path / name
    cfg = hf_cfg_cls(**cfg_kw)
    torch.manual_seed(seed)
    model = hf_model_cls(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / f"{name}.gguf"
    convert(d, out, outtype="f32")
    ids = ids or [1, 17, 42, 99, 7, 250, 3]
    with torch.no_grad():
        hf_logits = model(torch.tensor([ids])).logits[0].float().numpy()
    rt = Runtime.from_gguf(out)
    ours = rt.all_position_logits(ids)
    l1 = np.abs(_sm(ours) - _sm(hf_logits)).sum(-1)
    agree = (ours.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert l1.max() < tol, f"{name}: max L1 {l1.max():.4f}"
    assert agree >= 0.85, f"{name}: argmax agree {agree:.2%}"


_COMMON = dict(vocab_size=256, num_hidden_layers=2, rms_norm_eps=1e-5)


def test_convert_gpt2(tmp_path):
    _parity(transformers.GPT2Config, transformers.GPT2LMHeadModel, tmp_path,
            "tiny-gpt2", vocab_size=256, n_embd=64, n_layer=2, n_head=4,
            n_positions=128, n_inner=128)


def test_convert_gptneox(tmp_path):
    _parity(transformers.GPTNeoXConfig, transformers.GPTNeoXForCausalLM,
            tmp_path, "tiny-neox", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            rotary_pct=0.25, use_parallel_residual=True,
            max_position_embeddings=128, tie_word_embeddings=False)


def test_convert_falcon(tmp_path):
    _parity(transformers.FalconConfig, transformers.FalconForCausalLM,
            tmp_path, "tiny-falcon", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, multi_query=True,
            new_decoder_architecture=False, parallel_attn=True, bias=False,
            alibi=False, tie_word_embeddings=False)


def test_convert_bloom(tmp_path):
    _parity(transformers.BloomConfig, transformers.BloomForCausalLM,
            tmp_path, "tiny-bloom", vocab_size=256, hidden_size=64,
            n_layer=2, n_head=4)


def test_convert_mpt(tmp_path):
    _parity(transformers.MptConfig, transformers.MptForCausalLM, tmp_path,
            "tiny-mpt", vocab_size=256, d_model=64, n_heads=4, n_layers=2,
            max_seq_len=128)


def test_convert_starcoder(tmp_path):
    _parity(transformers.GPTBigCodeConfig,
            transformers.GPTBigCodeForCausalLM, tmp_path, "tiny-bigcode",
            vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=128,
            n_inner=128, multi_query=True)


def test_convert_phi2(tmp_path):
    _parity(transformers.PhiConfig, transformers.PhiForCausalLM, tmp_path,
            "tiny-phi2", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, partial_rotary_factor=0.5,
            tie_word_embeddings=False)


def test_convert_stablelm(tmp_path):
    _parity(transformers.StableLmConfig, transformers.StableLmForCausalLM,
            tmp_path, "tiny-stablelm", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            partial_rotary_factor=0.25, tie_word_embeddings=False)


def test_convert_gemma(tmp_path):
    _parity(transformers.GemmaConfig, transformers.GemmaForCausalLM,
            tmp_path, "tiny-gemma1", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16)


def test_convert_cohere(tmp_path):
    _parity(transformers.CohereConfig, transformers.CohereForCausalLM,
            tmp_path, "tiny-commandr", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, logit_scale=0.125,
            use_qk_norm=False)


def test_convert_olmo(tmp_path):
    _parity(transformers.OlmoConfig, transformers.OlmoForCausalLM, tmp_path,
            "tiny-olmo", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4, clip_qkv=None,
            tie_word_embeddings=False)


def test_convert_smollm3(tmp_path):
    _parity(transformers.SmolLM3Config, transformers.SmolLM3ForCausalLM,
            tmp_path, "tiny-smollm3", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=4,
            num_attention_heads=4, num_key_value_heads=2,
            no_rope_layer_interval=4, pad_token_id=0, tie_word_embeddings=False)


def _convert_smoke(hf_cfg_cls, hf_model_cls, tmp_path, name, **cfg_kw):
    """convert -> load -> deterministic generate. Used for archs where our
    engine intentionally replicates a reference-fork quirk that diverges
    from HF semantics (mixtral/granitemoe moe_normed_residual,
    models/llama.py:824), so HF logit parity cannot hold by design; the
    strict cross-check is the reference-engine parity test below."""
    d = tmp_path / name
    cfg = hf_cfg_cls(**cfg_kw)
    torch.manual_seed(0)
    model = hf_model_cls(cfg)
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / f"{name}.gguf"
    convert(d, out, outtype="f32")
    rt = Runtime.from_gguf(out)
    logits = rt.all_position_logits([1, 17, 42, 99])
    assert np.isfinite(np.asarray(logits)).all()
    return out


_MIXTRAL_KW = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, num_local_experts=4,
                   num_experts_per_tok=2, tie_word_embeddings=False)


def test_convert_mixtral_smoke(tmp_path):
    _convert_smoke(transformers.MixtralConfig,
                   transformers.MixtralForCausalLM, tmp_path,
                   "tiny-mixtral", **_MIXTRAL_KW)


def test_convert_mixtral_reference_parity(tmp_path):
    import test_cross_engine as tce
    if not (tce.ref_available and tce.build_gen_logits()):
        pytest.skip("reference build unavailable")
    out = _convert_smoke(transformers.MixtralConfig,
                         transformers.MixtralForCausalLM, tmp_path,
                         "tiny-mixtral-ref", **_MIXTRAL_KW)
    tce._parity_check(out, "Hello world", 0.15)


def test_convert_qwen2moe(tmp_path):
    _parity(transformers.Qwen2MoeConfig, transformers.Qwen2MoeForCausalLM,
            tmp_path, "tiny-q2moe", vocab_size=256, hidden_size=64,
            intermediate_size=128, moe_intermediate_size=48,
            shared_expert_intermediate_size=96, num_experts=4,
            num_experts_per_tok=2, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            decoder_sparse_step=1, mlp_only_layers=[],
            tie_word_embeddings=False)


def test_convert_dbrx(tmp_path):
    _parity(transformers.DbrxConfig, transformers.DbrxForCausalLM, tmp_path,
            "tiny-dbrx", vocab_size=256, d_model=64, n_heads=4, n_layers=2,
            max_seq_len=128,
            ffn_config=dict(ffn_hidden_size=96, moe_num_experts=4,
                            moe_top_k=2),
            attn_config=dict(kv_n_heads=2, rope_theta=10000.0),
            tie_word_embeddings=False)


_GMOE_KW = dict(vocab_size=256, hidden_size=64, intermediate_size=96,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, num_local_experts=4,
                num_experts_per_tok=2, embedding_multiplier=2.0,
                residual_multiplier=1.0, attention_multiplier=0.1,
                logits_scaling=4.0, tie_word_embeddings=False)


def test_convert_granitemoe_smoke(tmp_path):
    _convert_smoke(transformers.GraniteMoeConfig,
                   transformers.GraniteMoeForCausalLM, tmp_path,
                   "tiny-gmoe", **_GMOE_KW)


def test_convert_granitemoe_reference_parity(tmp_path):
    import test_cross_engine as tce
    if not (tce.ref_available and tce.build_gen_logits()):
        pytest.skip("reference build unavailable")
    out = _convert_smoke(transformers.GraniteMoeConfig,
                         transformers.GraniteMoeForCausalLM, tmp_path,
                         "tiny-gmoe-ref", **_GMOE_KW)
    tce._parity_check(out, "Hello world", 0.15)


def test_convert_deepseek_v2(tmp_path):
    _parity(transformers.DeepseekV2Config,
            transformers.DeepseekV2ForCausalLM, tmp_path, "tiny-dsv2",
            vocab_size=256, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, q_lora_rank=24, kv_lora_rank=32,
            qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
            tie_word_embeddings=False)


def test_convert_deepseek_v3(tmp_path):
    _parity(transformers.DeepseekV3Config,
            transformers.DeepseekV3ForCausalLM, tmp_path, "tiny-dsv3",
            vocab_size=256, hidden_size=64, intermediate_size=96,
            moe_intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
            first_k_dense_replace=1, q_lora_rank=24, kv_lora_rank=32,
            qk_nope_head_dim=32, qk_rope_head_dim=16, v_head_dim=32,
            n_group=1, topk_group=1, tie_word_embeddings=False)


def test_convert_glm4(tmp_path):
    _parity(transformers.Glm4Config, transformers.Glm4ForCausalLM, tmp_path,
            "tiny-glm4", vocab_size=256, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            partial_rotary_factor=0.5, attention_bias=True, pad_token_id=0,
            tie_word_embeddings=False)


def test_convert_seed_oss(tmp_path):
    _parity(transformers.SeedOssConfig, transformers.SeedOssForCausalLM,
            tmp_path, "tiny-seedoss", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, intermediate_size=96, rms_norm_eps=1e-5,
            attention_bias=True, max_position_embeddings=128,
            tie_word_embeddings=False)


def test_convert_ernie45(tmp_path):
    _parity(transformers.Ernie4_5Config, transformers.Ernie4_5ForCausalLM,
            tmp_path, "tiny-ernie", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96, rms_norm_eps=1e-5, use_bias=False,
            max_position_embeddings=128, tie_word_embeddings=False)


def test_convert_ernie45_moe(tmp_path):
    _parity(transformers.Ernie4_5_MoeConfig,
            transformers.Ernie4_5_MoeForCausalLM,
            tmp_path, "tiny-ernie-moe", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96, rms_norm_eps=1e-5, use_bias=False,
            moe_num_experts=4, moe_k=2, moe_intermediate_size=48,
            moe_num_shared_experts=1, moe_layer_start_index=1,
            moe_layer_interval=1, max_position_embeddings=128,
            tie_word_embeddings=False)


def test_convert_dots1(tmp_path):
    _parity(transformers.Dots1Config, transformers.Dots1ForCausalLM,
            tmp_path, "tiny-dots1", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=96, rms_norm_eps=1e-5,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, n_group=1, topk_group=1,
            routed_scaling_factor=1.0, norm_topk_prob=True,
            scoring_func="sigmoid", max_position_embeddings=128,
            tie_word_embeddings=False)


def test_convert_glm4moe(tmp_path):
    _parity(transformers.Glm4MoeConfig, transformers.Glm4MoeForCausalLM,
            tmp_path, "tiny-glm4moe", vocab_size=256, hidden_size=64,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, partial_rotary_factor=0.5, use_qk_norm=True,
            intermediate_size=96, rms_norm_eps=1e-5,
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=48, n_shared_experts=1,
            first_k_dense_replace=1, n_group=1, topk_group=1,
            routed_scaling_factor=1.0, norm_topk_prob=True,
            num_nextn_predict_layers=0, max_position_embeddings=128,
            tie_word_embeddings=False)


def test_convert_bert(tmp_path):
    """BertModel: per-position encoder parity vs HF last_hidden_state."""
    d = tmp_path / "tiny-bert"
    cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=128, type_vocab_size=2)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "bert.gguf"
    convert(d, out, outtype="f32")
    ids = [2, 17, 42, 99, 7, 3]
    with torch.no_grad():
        hf = model(torch.tensor([ids])).last_hidden_state[0].float().numpy()
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    ours = rt.embed(ids, "none", normalize=False)
    np.testing.assert_allclose(ours, hf, rtol=5e-2, atol=5e-2)


def test_convert_xlm_roberta(tmp_path):
    """XLMRobertaModel: position-offset trim + encoder parity."""
    d = tmp_path / "tiny-xlmr"
    cfg = transformers.XLMRobertaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=130, pad_token_id=1, type_vocab_size=1)
    torch.manual_seed(1)
    model = transformers.XLMRobertaModel(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "xlmr.gguf"
    convert(d, out, outtype="f32")
    ids = [5, 17, 42, 99, 7]
    with torch.no_grad():
        hf = model(torch.tensor([ids])).last_hidden_state[0].float().numpy()
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    ours = rt.embed(ids, "none", normalize=False)
    np.testing.assert_allclose(ours, hf, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("gated", [False, True])
def test_convert_t5(tmp_path, gated):
    """T5: encoder parity + decoder logits parity vs HF forward."""
    d = tmp_path / f"tiny-t5-{gated}"
    cfg = transformers.T5Config(
        vocab_size=256, d_model=64, num_layers=2, num_heads=4, d_kv=16,
        d_ff=96, relative_attention_num_buckets=8,
        feed_forward_proj="gated-gelu" if gated else "relu",
        tie_word_embeddings=False, decoder_start_token_id=0)
    torch.manual_seed(2)
    model = transformers.T5ForConditionalGeneration(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "t5.gguf"
    convert(d, out, outtype="f32")
    from ik_llama_cpp_tpu.runtime.t5_runtime import T5Runtime
    rt = T5Runtime.from_gguf(out)
    ids = [5, 17, 42, 99, 7, 1]
    dec_ids = [0, 11, 23]
    enc = rt.encode(ids)
    with torch.no_grad():
        hf_enc = model.encoder(torch.tensor([ids]))[0][0].float().numpy()
        hf_logits = model(input_ids=torch.tensor([ids]),
                          decoder_input_ids=torch.tensor([dec_ids])
                          ).logits[0].float().numpy()
    np.testing.assert_allclose(enc, hf_enc, rtol=5e-2, atol=5e-2)
    ours = rt.decoder_logits(dec_ids, enc)
    agree = (ours.argmax(-1) == hf_logits.argmax(-1)).mean()
    assert agree >= 0.9, f"t5 argmax agree {agree:.2%}"


# ---------------------------------------------------------------------------
# Community archs without native transformers classes: synthetic checkpoints
# (config.json + safetensors with the arch's HF tensor naming) -> convert ->
# load -> finite logits. Tensor-name layouts follow the reference's
# gguf-py/gguf/tensor_mapping.py tables.
# ---------------------------------------------------------------------------
import json as _json


def _run_synth(tmp_path, name, cfg_dict, tensors, n_check=4):
    from safetensors.numpy import save_file
    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(cfg_dict))
    save_file({k: np.ascontiguousarray(v, dtype=np.float32)
               for k, v in tensors.items()}, str(d / "model.safetensors"))
    out = tmp_path / f"{name}.gguf"
    convert(d, out, outtype="f32")
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    logits = rt.all_position_logits(list(range(3, 3 + n_check)))
    assert np.all(np.isfinite(logits)), name
    return logits


def _r(rng, *shape):
    return (rng.standard_normal(shape) / np.sqrt(shape[-1])).astype(np.float32)


def test_convert_qwen1_synthetic(tmp_path):
    rng = np.random.default_rng(0)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    t = {"transformer.wte.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"transformer.h.{i}"
        t |= {f"{b}.ln_1.weight": np.ones(E),
              f"{b}.attn.c_attn.weight": _r(rng, 3 * E, E),
              f"{b}.attn.c_attn.bias": _r(rng, 3 * E) * 0.02,
              f"{b}.attn.c_proj.weight": _r(rng, E, E),
              f"{b}.ln_2.weight": np.ones(E),
              f"{b}.mlp.w1.weight": _r(rng, FF, E),
              f"{b}.mlp.w2.weight": _r(rng, FF, E),
              f"{b}.mlp.c_proj.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["QWenLMHeadModel"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": 2 * FF,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "qwen1", cfg, t)


def test_convert_baichuan_synthetic(tmp_path):
    # 32 layers: the reference types baichuan by layer count (7B = rope;
    # unknown counts abort in build_baichuan)
    rng = np.random.default_rng(1)
    E, H, L, FF, V = 32, 2, 32, 64, 256
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.W_pack.weight": _r(rng, 3 * E, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["BaichuanForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": FF,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128}
    _run_synth(tmp_path, "baichuan", cfg, t)


def test_convert_internlm2_synthetic(tmp_path):
    rng = np.random.default_rng(2)
    E, H, HKV, L, FF, V = 64, 4, 2, 2, 96, 256
    hd = E // H
    t = {"model.tok_embeddings.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "output.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.attention_norm.weight": np.ones(E),
              f"{b}.ffn_norm.weight": np.ones(E),
              f"{b}.attention.wqkv.weight": _r(rng, HKV * (H // HKV + 2) * hd, E),
              f"{b}.attention.wo.weight": _r(rng, E, E),
              f"{b}.feed_forward.w1.weight": _r(rng, FF, E),
              f"{b}.feed_forward.w3.weight": _r(rng, FF, E),
              f"{b}.feed_forward.w2.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["InternLM2ForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "internlm2", cfg, t)


@pytest.mark.parametrize("hf_arch,arch", [
    ("OrionForCausalLM", "orion"),
    ("XverseForCausalLM", "xverse"),
    ("MiniCPMForCausalLM", "minicpm"),
])
def test_convert_llama_likes_synthetic(tmp_path, hf_arch, arch):
    rng = np.random.default_rng(3)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    if hf_arch == "OrionForCausalLM":
        t["model.norm.bias"] = np.zeros(E)
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        if hf_arch == "OrionForCausalLM":
            t |= {f"{b}.input_layernorm.bias": np.zeros(E),
                  f"{b}.post_attention_layernorm.bias": np.zeros(E)}
    cfg = {"architectures": [hf_arch], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": FF,
           "rms_norm_eps": 1e-5, "max_position_embeddings": 128}
    _run_synth(tmp_path, arch, cfg, t)


def test_convert_refact_synthetic(tmp_path):
    rng = np.random.default_rng(4)
    E, H, L, V = 64, 4, 2, 256
    hd = E // H
    ff = 256 * ((int(2 * 4 * E / 3) + 255) // 256)
    t = {"transformer.wte.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"transformer.h.{i}"
        t |= {f"{b}.ln_1.weight": np.ones(E), f"{b}.ln_2.weight": np.ones(E),
              f"{b}.attn.q.weight": _r(rng, E, E),
              f"{b}.attn.kv.weight": _r(rng, 2 * hd, E),
              f"{b}.attn.c_proj.weight": _r(rng, E, E),
              f"{b}.mlp.gate_up_proj.weight": _r(rng, 2 * ff, E),
              f"{b}.mlp.c_proj.weight": _r(rng, E, ff)}
    cfg = {"architectures": ["GPTRefactForCausalLM"], "vocab_size": V,
           "n_layer": L, "n_embd": E, "n_head": H,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "max_position_embeddings": 128}
    _run_synth(tmp_path, "refact", cfg, t)


def test_convert_codeshell_synthetic(tmp_path):
    rng = np.random.default_rng(5)
    E, H, HKV, L, V = 64, 4, 2, 2, 256
    hd = E // H
    qkv = E + 2 * HKV * hd
    t = {"transformer.wte.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E),
         "transformer.ln_f.bias": np.zeros(E)}
    for i in range(L):
        b = f"transformer.h.{i}"
        t |= {f"{b}.ln_1.weight": np.ones(E), f"{b}.ln_1.bias": np.zeros(E),
              f"{b}.attn.c_attn.weight": _r(rng, qkv, E),
              f"{b}.attn.c_attn.bias": _r(rng, qkv) * 0.02,
              f"{b}.attn.c_proj.weight": _r(rng, E, E),
              f"{b}.attn.c_proj.bias": _r(rng, E) * 0.02,
              f"{b}.ln_2.weight": np.ones(E), f"{b}.ln_2.bias": np.zeros(E),
              f"{b}.mlp.c_fc.weight": _r(rng, 4 * E, E),
              f"{b}.mlp.c_fc.bias": _r(rng, 4 * E) * 0.02,
              f"{b}.mlp.c_proj.weight": _r(rng, E, 4 * E),
              f"{b}.mlp.c_proj.bias": _r(rng, E) * 0.02}
    cfg = {"architectures": ["CodeShellForCausalLM"], "vocab_size": V,
           "n_layer": L, "n_embd": E, "n_head": H, "num_query_groups": HKV,
           "layer_norm_epsilon": 1e-5, "n_positions": 128}
    _run_synth(tmp_path, "codeshell", cfg, t)


def test_convert_chatglm_synthetic(tmp_path):
    rng = np.random.default_rng(6)
    E, H, HKV, L, FF, V = 64, 4, 2, 2, 96, 256
    hd = E // H
    qkv = E + 2 * HKV * hd
    t = {"transformer.embedding.word_embeddings.weight": _r(rng, V, E),
         "transformer.encoder.final_layernorm.weight": np.ones(E),
         "transformer.output_layer.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"transformer.encoder.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.self_attention.query_key_value.weight": _r(rng, qkv, E),
              f"{b}.self_attention.query_key_value.bias": _r(rng, qkv) * 0.02,
              f"{b}.self_attention.dense.weight": _r(rng, E, E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.mlp.dense_h_to_4h.weight": _r(rng, 2 * FF, E),
              f"{b}.mlp.dense_4h_to_h.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["ChatGLMModel"], "vocab_size": V,
           "num_layers": L, "hidden_size": E, "num_attention_heads": H,
           "multi_query_group_num": HKV, "ffn_hidden_size": FF,
           "layernorm_epsilon": 1e-5, "seq_length": 128}
    _run_synth(tmp_path, "chatglm", cfg, t)


# codeshell excluded: the reference fork's llm_build_ffn applies ffn_norm
# as RMS with rms_eps=0 for LayerNorm archs and asserts (see
# test_classic_archs.py module docstring) — our-side smoke only, like the
# fixture-based tests.
@pytest.mark.parametrize("builder", [
    "qwen1", "baichuan", "internlm2", "chatglm", "refact"])
def test_convert_ref_engine_parity(tmp_path, builder):
    """Converted synthetic checkpoints must load and run in the REFERENCE
    engine with logits matching ours — validates GGUF structure, metadata,
    and weight layout against the reference's own loader."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_cross_engine import (ref_available, build_gen_logits,
                                   _parity_check_loose)
    if not (ref_available and build_gen_logits()):
        pytest.skip("reference build unavailable")
    fn = {
        "qwen1": test_convert_qwen1_synthetic,
        "baichuan": test_convert_baichuan_synthetic,
        "internlm2": test_convert_internlm2_synthetic,
        "chatglm": test_convert_chatglm_synthetic,
        "refact": test_convert_refact_synthetic,
    }[builder]
    fn(tmp_path)
    ggufs = list(tmp_path.glob("*.gguf"))
    assert len(ggufs) == 1
    _parity_check_loose(ggufs[0], "hello world test", mean_tol=0.1,
                        agree_tol=0.85)


def test_convert_minimax_m2_synthetic(tmp_path):
    rng = np.random.default_rng(7)
    E, H, HKV, L, FF, V, NE = 64, 4, 2, 2, 48, 256, 4
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.q_norm.weight": np.ones(E),
              f"{b}.self_attn.k_norm.weight": np.ones(HKV * hd),
              f"{b}.block_sparse_moe.gate.weight": _r(rng, NE, E),
              f"{b}.block_sparse_moe.gate.e_score_correction_bias":
                  _r(rng, NE) * 0.1}
        for e in range(NE):
            eb = f"{b}.block_sparse_moe.experts.{e}"
            t |= {f"{eb}.w1.weight": _r(rng, FF, E),
                  f"{eb}.w3.weight": _r(rng, FF, E),
                  f"{eb}.w2.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["MiniMaxM2ForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "num_local_experts": NE, "num_experts_per_tok": 2,
           "scoring_func": "sigmoid", "rotary_dim": hd,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "minimaxm2", cfg, t)


def test_convert_mellum_synthetic(tmp_path):
    rng = np.random.default_rng(8)
    E, H, HKV, L, FF, V = 64, 4, 2, 2, 96, 256
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.q_norm.weight": np.ones(hd),
              f"{b}.self_attn.k_norm.weight": np.ones(hd),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["MellumForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "mellum", cfg, t)


def test_convert_bailingmoe2_synthetic(tmp_path):
    rng = np.random.default_rng(9)
    E, H, HKV, L, FF, FFE, V, NE = 64, 4, 2, 2, 96, 48, 256, 4
    hd = E // H
    qkv = (H + 2 * HKV) * hd
    t = {"model.word_embeddings.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.attention.query_key_value.weight": _r(rng, qkv, E),
              f"{b}.attention.dense.weight": _r(rng, E, E),
              f"{b}.attention.query_layernorm.weight": np.ones(hd),
              f"{b}.attention.key_layernorm.weight": np.ones(hd)}
        if i == 0:   # dense lead
            t |= {f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        else:
            t |= {f"{b}.mlp.gate.weight": _r(rng, NE, E),
                  f"{b}.mlp.gate.expert_bias": _r(rng, NE) * 0.1,
                  f"{b}.mlp.shared_experts.gate_proj.weight": _r(rng, FFE, E),
                  f"{b}.mlp.shared_experts.up_proj.weight": _r(rng, FFE, E),
                  f"{b}.mlp.shared_experts.down_proj.weight": _r(rng, E, FFE)}
            for e in range(NE):
                eb = f"{b}.mlp.experts.{e}"
                t |= {f"{eb}.gate_proj.weight": _r(rng, FFE, E),
                      f"{eb}.up_proj.weight": _r(rng, FFE, E),
                      f"{eb}.down_proj.weight": _r(rng, E, FFE)}
    cfg = {"architectures": ["BailingMoeV2ForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "moe_intermediate_size": FFE,
           "rms_norm_eps": 1e-5, "num_experts": NE,
           "num_experts_per_tok": 2, "num_shared_experts": 1,
           "first_k_dense_replace": 1, "routed_scaling_factor": 1.0,
           "norm_topk_prob": True, "score_function": "sigmoid",
           "partial_rotary_factor": 0.5, "max_position_embeddings": 128}
    _run_synth(tmp_path, "bailingmoe2", cfg, t)


def test_convert_cohere2moe_synthetic(tmp_path):
    rng = np.random.default_rng(10)
    E, H, HKV, L, FF, V, NE = 64, 4, 2, 2, 48, 256, 4
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E)}
        if i == 0:
            t |= {f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        else:
            t[f"{b}.mlp.gate.weight"] = _r(rng, NE, E)
            for e in range(NE):
                eb = f"{b}.mlp.experts.{e}"
                t |= {f"{eb}.gate_proj.weight": _r(rng, FF, E),
                      f"{eb}.up_proj.weight": _r(rng, FF, E),
                      f"{eb}.down_proj.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["Cohere2MoeForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF,
           "prefix_dense_intermediate_size": FF,
           "layer_norm_eps": 1e-5, "num_experts": NE,
           "num_experts_per_tok": 2, "first_k_dense_replace": 1,
           "sliding_window": 32,
           "layer_types": ["sliding_attention", "full_attention"],
           "expert_selection_fn": "sigmoid", "logit_scale": 0.8,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "cohere2moe", cfg, t)


def test_convert_arctic_synthetic(tmp_path):
    rng = np.random.default_rng(11)
    E, H, HKV, L, FF, V, NE = 64, 4, 2, 2, 96, 256, 4
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.residual_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.residual_mlp.w1.weight": _r(rng, FF, E),
              f"{b}.residual_mlp.w3.weight": _r(rng, FF, E),
              f"{b}.residual_mlp.w2.weight": _r(rng, E, FF),
              f"{b}.block_sparse_moe.gate.weight": _r(rng, NE, E)}
        for e in range(NE):
            eb = f"{b}.block_sparse_moe.experts.{e}"
            t |= {f"{eb}.w1.weight": _r(rng, FF, E),
                  f"{eb}.w3.weight": _r(rng, FF, E),
                  f"{eb}.w2.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["ArcticForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "num_local_experts": NE, "num_experts_per_tok": 2,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "arctic", cfg, t)


def test_convert_jais_synthetic(tmp_path):
    rng = np.random.default_rng(12)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    # Conv1D order (in, out) on disk, transposed by the converter
    t = {"transformer.wte.weight": _r(rng, V, E),
         "transformer.ln_f.weight": np.ones(E),
         "transformer.ln_f.bias": np.zeros(E),
         "transformer.relative_pe.slopes": np.asarray(
             [2.0 ** (-8.0 / H * (i + 1)) for i in range(H)], np.float32)}
    for i in range(L):
        b = f"transformer.h.{i}"
        t |= {f"{b}.ln_1.weight": np.ones(E), f"{b}.ln_1.bias": np.zeros(E),
              f"{b}.ln_2.weight": np.ones(E), f"{b}.ln_2.bias": np.zeros(E),
              f"{b}.attn.c_attn.weight": _r(rng, E, 3 * E),
              f"{b}.attn.c_attn.bias": _r(rng, 3 * E) * 0.02,
              f"{b}.attn.c_proj.weight": _r(rng, E, E),
              f"{b}.attn.c_proj.bias": _r(rng, E) * 0.02,
              f"{b}.mlp.c_fc.weight": _r(rng, E, FF),
              f"{b}.mlp.c_fc.bias": _r(rng, FF) * 0.02,
              f"{b}.mlp.c_fc2.weight": _r(rng, E, FF),
              f"{b}.mlp.c_fc2.bias": _r(rng, FF) * 0.02,
              f"{b}.mlp.c_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.c_proj.bias": _r(rng, E) * 0.02}
    cfg = {"architectures": ["JAISLMHeadModel"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": FF,
           "layer_norm_epsilon": 1e-5, "mup_embeddings_scale": 1.5,
           "mup_output_alpha": 1.2, "mup_width_scale": 0.5,
           "max_position_embeddings": 128}
    logits = _run_synth(tmp_path, "jais", cfg, t)
    # mup scales must have been folded (logits sensitive to width_scale)
    assert np.abs(logits).max() > 0


def test_convert_nomic_bert_synthetic(tmp_path):
    rng = np.random.default_rng(13)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    t = {"embeddings.word_embeddings.weight": _r(rng, V, E),
         "embeddings.token_type_embeddings.weight": _r(rng, 2, E),
         "emb_ln.weight": np.ones(E), "emb_ln.bias": np.zeros(E)}
    for i in range(L):
        b = f"encoder.layers.{i}"
        t |= {f"{b}.attn.Wqkv.weight": _r(rng, 3 * E, E),
              f"{b}.attn.out_proj.weight": _r(rng, E, E),
              f"{b}.norm1.weight": np.ones(E), f"{b}.norm1.bias": np.zeros(E),
              f"{b}.mlp.fc11.weight": _r(rng, FF, E),
              f"{b}.mlp.fc12.weight": _r(rng, FF, E),
              f"{b}.mlp.fc2.weight": _r(rng, E, FF),
              f"{b}.norm2.weight": np.ones(E), f"{b}.norm2.bias": np.zeros(E)}
    cfg = {"architectures": ["NomicBertModel"], "vocab_size": V,
           "n_layer": L, "n_embd": E, "n_head": H, "n_inner": FF,
           "layer_norm_epsilon": 1e-12, "rotary_emb_base": 1000.0,
           "n_positions": 128, "type_vocab_size": 2}
    from safetensors.numpy import save_file
    d = tmp_path / "nomic"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v, dtype=np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    out = tmp_path / "nomic.gguf"
    convert(d, out, outtype="f32")
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    e = rt.embed([3, 5, 7, 9], "mean")
    assert np.all(np.isfinite(e))


def test_convert_jina_bert_synthetic(tmp_path):
    rng = np.random.default_rng(14)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    t = {"embeddings.word_embeddings.weight": _r(rng, V, E),
         "embeddings.token_type_embeddings.weight": _r(rng, 2, E),
         "embeddings.LayerNorm.weight": np.ones(E),
         "embeddings.LayerNorm.bias": np.zeros(E)}
    for i in range(L):
        b = f"encoder.layer.{i}"
        t |= {f"{b}.attention.self.query.weight": _r(rng, E, E),
              f"{b}.attention.self.query.bias": np.zeros(E),
              f"{b}.attention.self.key.weight": _r(rng, E, E),
              f"{b}.attention.self.key.bias": np.zeros(E),
              f"{b}.attention.self.value.weight": _r(rng, E, E),
              f"{b}.attention.self.value.bias": np.zeros(E),
              f"{b}.attention.self.layer_norm_q.weight": np.ones(E),
              f"{b}.attention.self.layer_norm_q.bias": np.zeros(E),
              f"{b}.attention.self.layer_norm_k.weight": np.ones(E),
              f"{b}.attention.self.layer_norm_k.bias": np.zeros(E),
              f"{b}.attention.output.dense.weight": _r(rng, E, E),
              f"{b}.attention.output.dense.bias": np.zeros(E),
              f"{b}.attention.output.LayerNorm.weight": np.ones(E),
              f"{b}.attention.output.LayerNorm.bias": np.zeros(E),
              f"{b}.mlp.gated_layers_w.weight": _r(rng, FF, E),
              f"{b}.mlp.gated_layers_v.weight": _r(rng, FF, E),
              f"{b}.mlp.wo.weight": _r(rng, E, FF),
              f"{b}.mlp.wo.bias": np.zeros(E),
              f"{b}.mlp.layernorm.weight": np.ones(E),
              f"{b}.mlp.layernorm.bias": np.zeros(E)}
    cfg = {"architectures": ["JinaBertModel"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": FF,
           "layer_norm_eps": 1e-12, "attn_implementation": "alibi",
           "max_position_embeddings": 128, "type_vocab_size": 2}
    from safetensors.numpy import save_file
    d = tmp_path / "jina"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(cfg))
    save_file({k: np.ascontiguousarray(v, dtype=np.float32)
               for k, v in t.items()}, str(d / "model.safetensors"))
    out = tmp_path / "jina.gguf"
    convert(d, out, outtype="f32")
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    e = rt.embed([3, 5, 7, 9], "mean")
    assert np.all(np.isfinite(e))


def test_convert_bitnet(tmp_path):
    """HF BitNet (2B4T lineage): conversion ternarizes projections with
    .scale companions; engine output finite + deterministic."""
    d = tmp_path / "tiny-bitnet"
    cfg = transformers.BitNetConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=96,
        max_position_embeddings=128)
    torch.manual_seed(3)
    model = transformers.BitNetForCausalLM(cfg)
    model.eval()
    model.save_pretrained(d, safe_serialization=True)
    out = tmp_path / "bitnet.gguf"
    convert(d, out, outtype="f32")
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    gg = load_gguf(out)
    assert "blk.0.attn_q.scale" in gg.tensors          # ternary companion
    w = gg.tensors["blk.0.attn_q.weight"]
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    l1 = rt.all_position_logits([3, 5, 7, 9])
    l2 = rt.all_position_logits([3, 5, 7, 9])
    assert np.all(np.isfinite(l1)) and np.array_equal(l1, l2)


def test_convert_openelm_synthetic(tmp_path):
    rng = np.random.default_rng(15)
    E, L, V, HD = 64, 2, 256, 16
    qh, kvh = [4, 4], [2, 1]
    ffm, div = [1.0, 2.0], 32
    def mkdiv(v):
        nv = max(div, int(v + div / 2) // div * div)
        return nv + div if nv < 0.9 * v else nv
    ffn = [mkdiv(m * E) for m in ffm]
    t = {"transformer.token_embeddings.weight": _r(rng, V, E),
         "transformer.norm.weight": np.ones(E)}
    for i in range(L):
        b = f"transformer.layers.{i}"
        qkv = (qh[i] + 2 * kvh[i]) * HD
        t |= {f"{b}.attn_norm.weight": np.ones(E),
              f"{b}.attn.qkv_proj.weight": _r(rng, qkv, E),
              f"{b}.attn.out_proj.weight": _r(rng, qh[i] * HD, E).T.copy(),
              f"{b}.attn.q_norm.weight": np.ones(HD),
              f"{b}.attn.k_norm.weight": np.ones(HD),
              f"{b}.ffn_norm.weight": np.ones(E),
              f"{b}.ffn.proj_1.weight": _r(rng, 2 * ffn[i], E),
              f"{b}.ffn.proj_2.weight": _r(rng, E, ffn[i])}
    cfg = {"architectures": ["OpenELMForCausalLM"], "vocab_size": V,
           "num_transformer_layers": L, "model_dim": E, "head_dim": HD,
           "num_query_heads": qh, "num_kv_heads": kvh,
           "ffn_multipliers": ffm, "ffn_dim_divisor": div,
           "rope_freq_constant": 10000.0, "max_context_length": 128}
    _run_synth(tmp_path, "openelm", cfg, t)


def test_convert_deci_synthetic(tmp_path):
    rng = np.random.default_rng(16)
    E, H, V = 64, 4, 256
    bcs = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 2.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 2.0}},
        {"attention": {"n_heads_in_group": 4, "replace_with_linear": False},
         "ffn": {"ffn_mult": 1.0}},
    ]
    L = len(bcs)
    def ffs(m):
        x = int(2 * m * E / 3)
        return ((x + 255) // 256) * 256
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i, bc in enumerate(bcs):
        b = f"model.layers.{i}"
        ff = ffs(bc["ffn"]["ffn_mult"])
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.mlp.gate_proj.weight": _r(rng, ff, E),
              f"{b}.mlp.up_proj.weight": _r(rng, ff, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, ff)}
        grp = bc["attention"]["n_heads_in_group"]
        if grp is None:
            t[f"{b}.self_attn.linear_attn.weight"] = _r(rng, E, E)
        else:
            kv = H // grp
            t |= {f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
                  f"{b}.self_attn.k_proj.weight": _r(rng, kv * 16, E),
                  f"{b}.self_attn.v_proj.weight": _r(rng, kv * 16, E),
                  f"{b}.self_attn.o_proj.weight": _r(rng, E, E)}
    cfg = {"architectures": ["DeciLMForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "intermediate_size": 128,
           "block_configs": bcs, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "deci", cfg, t)


def test_convert_plamo_synthetic(tmp_path):
    rng = np.random.default_rng(17)
    E, H, L, FF, V = 64, 4, 2, 96, 256
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.layers.{i}"
        t |= {f"{b}.norm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["PlamoForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": H,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "plamo", cfg, t)


def test_convert_grok_synthetic(tmp_path):
    rng = np.random.default_rng(18)
    E, H, HKV, L, FF, V, NE = 64, 4, 2, 2, 96, 256, 4
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.pre_attn_norm.weight": np.ones(E),
              f"{b}.post_attn_norm.weight": np.ones(E),
              f"{b}.pre_moe_norm.weight": np.ones(E),
              f"{b}.post_moe_norm.weight": np.ones(E),
              f"{b}.attn.q_proj.weight": _r(rng, E, E),
              f"{b}.attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.attn.o_proj.weight": _r(rng, E, E),
              f"{b}.block_sparse_moe.gate.weight": _r(rng, NE, E)}
        for e in range(NE):
            eb = f"{b}.block_sparse_moe.experts.{e}"
            t |= {f"{eb}.w1.weight": _r(rng, FF, E),
                  f"{eb}.w3.weight": _r(rng, FF, E),
                  f"{eb}.w2.weight": _r(rng, E, FF)}
    cfg = {"architectures": ["GrokForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "num_local_experts": NE, "num_experts_per_tok": 2,
           "attn_logit_softcapping": 30.0,
           "embedding_multiplier_scale": 1.0,
           "output_multiplier_scale": 0.5,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "grok", cfg, t)


def test_convert_openpangu_synthetic(tmp_path):
    """OpenPanguV2: MLA split, mHC, MoME convs, sinks, DSA schedule."""
    rng = np.random.default_rng(19)
    E, H, L, V = 64, 4, 3, 256
    d_nope, d_rope, d_v, q_lora, kv_lora = 32, 16, 32, 24, 32
    NE, FF, FFE, lead = 4, 96, 48, 1
    mhc_s, n_sink = 4, 32
    idx_h, idx_d = 4, 32
    dk = d_nope + d_rope
    SH = mhc_s * E
    phi_out = (mhc_s + 2) * mhc_s
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E),
         "model.merge_mhc_module.phi": _r(rng, mhc_s, SH),
         "model.merge_mhc_module.branch_alpha_pre": np.ones(1),
         "model.merge_mhc_module.branch_beta_pre": _r(rng, mhc_s) * 0.1,
         "model.merge_mhc_module.norm_gamma": np.ones(SH)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.pre_mlp_layernorm.weight": np.ones(E),
              f"{b}.post_mlp_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_a_proj.weight": _r(rng, q_lora, E),
              f"{b}.self_attn.q_a_layernorm.weight": np.ones(q_lora),
              f"{b}.self_attn.q_b_proj.weight": _r(rng, H * dk, q_lora),
              f"{b}.self_attn.kv_a_proj_with_mqa.weight":
                  _r(rng, kv_lora + d_rope, E),
              f"{b}.self_attn.kv_a_layernorm.weight": np.ones(kv_lora),
              f"{b}.self_attn.kv_b_proj.weight":
                  _r(rng, H * (d_nope + d_v), kv_lora),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, H * d_v),
              f"{b}.self_attn.qa_conv.weight": _r(rng, q_lora, 3) * 0.1,
              f"{b}.self_attn.compresskv_conv.weight":
                  _r(rng, kv_lora, 3) * 0.1,
              f"{b}.self_attn.o_conv.weight": _r(rng, H * d_v, 3) * 0.1,
              f"{b}.self_attn.param_sink_compressed_kv":
                  _r(rng, n_sink, kv_lora),
              f"{b}.self_attn.param_sink_k_pe": _r(rng, n_sink, d_rope)}
        if i == 1:   # DSA layer
            t |= {f"{b}.self_attn.indexer.wq_b.weight":
                      _r(rng, idx_h * idx_d, q_lora),
                  f"{b}.self_attn.indexer.wk.weight": _r(rng, idx_d, E),
                  f"{b}.self_attn.indexer.k_norm.weight": np.ones(idx_d),
                  f"{b}.self_attn.indexer.weights_proj.weight":
                      _r(rng, idx_h, E)}
        for pre in ("attn_mhc_module", "mlp_mhc_module"):
            t |= {f"{b}.{pre}.phi": _r(rng, phi_out, SH),
                  f"{b}.{pre}.branch_alpha": np.ones(3),
                  f"{b}.{pre}.branch_beta":
                      _r(rng, 2 * mhc_s + mhc_s * mhc_s) * 0.1,
                  f"{b}.{pre}.norm_gamma": np.ones(SH)}
        if i == 2:
            t[f"{b}.block_post_layernorm.weight"] = np.ones(SH)
        if i < lead:
            t |= {f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        else:
            t |= {f"{b}.mlp.gate.weight": _r(rng, NE, E),
                  f"{b}.mlp.e_score_correction_bias": _r(rng, NE) * 0.1,
                  f"{b}.mlp.shared_experts.gate_proj.weight": _r(rng, FFE, E),
                  f"{b}.mlp.shared_experts.up_proj.weight": _r(rng, FFE, E),
                  f"{b}.mlp.shared_experts.down_proj.weight": _r(rng, E, FFE)}
            for e in range(NE):
                eb = f"{b}.mlp.experts.{e}"
                t |= {f"{eb}.gate_proj.weight": _r(rng, FFE, E),
                      f"{eb}.up_proj.weight": _r(rng, FFE, E),
                      f"{eb}.down_proj.weight": _r(rng, E, FFE)}
    cfg = {"architectures": ["OpenPanguV2ForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": H,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "qk_nope_head_dim": d_nope, "qk_rope_head_dim": d_rope,
           "v_head_dim": d_v, "q_lora_rank": q_lora,
           "kv_lora_rank": kv_lora, "first_k_dense_replace": lead,
           "n_routed_experts": NE, "num_experts_per_tok": 2,
           "n_shared_experts": 1, "moe_intermediate_size": FFE,
           "routed_scaling_factor": 1.5, "norm_topk_prob": True,
           "index_n_heads": idx_h, "index_head_dim": idx_d,
           "index_topk": 6, "mhc_num_stream": mhc_s,
           "mhc_recur_norm": 20, "param_sink_number": n_sink,
           "sliding_window": 8, "swa_layers": [0, 2],
           "sliding_window_list": [8, 8], "rope_theta": 10000.0,
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "openpangu", cfg, t)


def test_convert_laguna_synthetic(tmp_path):
    rng = np.random.default_rng(20)
    E, H, HKV, L, FF, FFE, SHE, V, NE = 64, 4, 2, 3, 96, 48, 32, 256, 4
    hd = E // H
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        gate_w = H if i % 2 == 0 else E
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, E),
              f"{b}.self_attn.q_norm.weight": np.ones(hd),
              f"{b}.self_attn.k_norm.weight": np.ones(hd),
              f"{b}.self_attn.g_proj.weight":
                  _r(rng, gate_w, 1, E).reshape(gate_w, 1, E)}
        if i == 0:
            t |= {f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
                  f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        else:
            t |= {f"{b}.mlp.gate.weight": _r(rng, NE, E),
                  f"{b}.mlp.experts.e_score_correction_bias": _r(rng, NE) * 0.1,
                  f"{b}.mlp.shared_experts.gate_proj.weight": _r(rng, SHE, E),
                  f"{b}.mlp.shared_experts.up_proj.weight": _r(rng, SHE, E),
                  f"{b}.mlp.shared_experts.down_proj.weight": _r(rng, E, SHE)}
            for e in range(NE):
                eb = f"{b}.mlp.experts.{e}"
                t |= {f"{eb}.gate_proj.weight": _r(rng, FFE, E),
                      f"{eb}.up_proj.weight": _r(rng, FFE, E),
                      f"{eb}.down_proj.weight": _r(rng, E, FFE)}
    cfg = {"architectures": ["LagunaForCausalLM"], "vocab_size": V,
           "num_hidden_layers": L, "hidden_size": E,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "num_experts": NE, "num_experts_per_tok": 2,
           "moe_intermediate_size": FFE,
           "shared_expert_intermediate_size": SHE,
           "mlp_layer_types": ["dense", "moe", "moe"],
           "layer_types": ["full_attention", "sliding_attention",
                           "full_attention"],
           "sliding_window": 32,
           "rope_parameters": {
               "full_attention": {"rope_theta": 10000.0,
                                  "partial_rotary_factor": 0.5},
               "sliding_attention": {"rope_theta": 50000.0}},
           "max_position_embeddings": 128}
    _run_synth(tmp_path, "laguna", cfg, t)


# ---------------------------------------------------------------------------
# Round-3 additions: the dflash / gemma4 / deepseek4 converter families
# (the last reference register classes, convert_hf_to_gguf.py:2334/3869/4738)
# ---------------------------------------------------------------------------
def _write_synth(tmp_path, name, cfg_dict, tensors):
    from safetensors.numpy import save_file
    d = tmp_path / name
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(cfg_dict))
    save_file({k: np.ascontiguousarray(v, dtype=np.float32)
               for k, v in tensors.items()}, str(d / "model.safetensors"))
    out = tmp_path / f"{name}.gguf"
    convert(d, out, outtype="f32")
    return out


def _dflash_draft_tensors(rng, E, H, HKV, hd, L, FF, V, packed=False):
    t = {"embed_tokens.weight": _r(rng, V, E),
         "norm.weight": np.ones(E), "lm_head.weight": _r(rng, V, E),
         "fc.weight": _r(rng, E, 2 * E), "hidden_norm.weight": np.ones(E)}
    for i in range(L):
        b = f"layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, H * hd),
              f"{b}.self_attn.q_norm.weight": np.ones(hd),
              f"{b}.self_attn.k_norm.weight": np.ones(hd),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF)}
        if packed:
            t[f"{b}.self_attn.qkv_proj.weight"] = _r(
                rng, (H + 2 * HKV) * hd, E)
        else:
            t |= {f"{b}.self_attn.q_proj.weight": _r(rng, H * hd, E),
                  f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
                  f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
                  f"{b}.self_attn.attention_sink_bias": _r(rng, H) * 0.1}
    return t


def _load_dflash(out):
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.config import config_from_gguf
    from ik_llama_cpp_tpu.models import dflash as DF
    gg = load_gguf(out)
    cfg = config_from_gguf(gg.metadata)
    return cfg, DF.load_dflash_params(gg, cfg, use_quant=False)


def test_convert_dflash_draft_synthetic(tmp_path):
    rng = np.random.default_rng(21)
    E, H, HKV, hd, L, FF, V = 64, 2, 1, 64, 2, 96, 256
    t = _dflash_draft_tensors(rng, E, H, HKV, hd, L, FF, V)
    cfg = {"architectures": ["DFlashDraftModel"], "vocab_size": V,
           "hidden_size": E, "num_hidden_layers": L,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "head_dim": hd, "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 256, "rope_theta": 10000.0,
           "partial_rotary_factor": 0.5,
           "dflash_config": {"block_size": 8, "mask_token_id": 3,
                             "target_layer_ids": [0, 1],
                             "backbone_rotary_base": 50000.0,
                             "attention_value_scale": 1.5}}
    out = _write_synth(tmp_path, "dflash-draft", cfg, t)
    mcfg, params = _load_dflash(out)
    assert mcfg.arch == "dflash-draft"
    x = mcfg.extra
    assert x["block_size"] == 8 and x["mask_token_id"] == 3
    assert x["target_layer_ids"] == [0, 1]
    assert x["n_target_features"] == 2 * E          # inferred from hidden
    assert x["backbone_rotary_base"] == 50000.0
    assert x["attn_v_scale"] == 1.5 and not x["laguna"]
    assert mcfg.rope_dim == hd // 2                 # partial rotary honored
    assert "sinks" in params["blocks"][0]
    assert params["blocks"][0]["wq"].w.shape == (E, H * hd)


def test_convert_dflash_laguna_synthetic(tmp_path):
    rng = np.random.default_rng(22)
    E, H, HKV, hd, L, FF, V = 64, 2, 1, 32, 2, 96, 256
    t = _dflash_draft_tensors(rng, E, H, HKV, hd, L, FF, V, packed=True)
    t |= {"aux_hidden_norms.0.weight": np.ones(E),
          "aux_hidden_norms.1.weight": np.ones(E)}
    for i in range(L):
        t[f"layers.{i}.self_attn.g_proj.weight"] = \
            _r(rng, H, 1, E).reshape(H, 1, E)
    cfg = {"architectures": ["DFlashLagunaForCausalLM"], "vocab_size": V,
           "hidden_size": E, "num_hidden_layers": L,
           "num_attention_heads": H, "num_key_value_heads": HKV,
           "head_dim": hd, "intermediate_size": FF, "rms_norm_eps": 1e-5,
           "max_position_embeddings": 256, "rope_theta": 10000.0,
           "sliding_window": 8, "gating": "per-head",
           "layer_types": ["sliding_attention"] * L,
           "dflash_config": {"causal": True, "block_size": 8,
                             "mask_token_id": 3,
                             "target_layer_ids": [0, 1]}}
    out = _write_synth(tmp_path, "dflash-laguna", cfg, t)
    mcfg, params = _load_dflash(out)
    assert mcfg.extra["laguna"]
    assert mcfg.swa_window == 8 and mcfg.layer_is_swa(0)
    assert len(params["aux_norms"]) == 2
    blk = params["blocks"][0]
    assert "attn_gate" in blk
    # packed qkv was split planar: q rows then k/v rows
    assert blk["wq"].w.shape == (E, H * hd)
    assert blk["wk"].w.shape == (E, HKV * hd)


def test_convert_gemma4_synthetic(tmp_path):
    rng = np.random.default_rng(23)
    E, H, HKV, hd, L, FF, V, PL = 64, 4, 2, 64, 2, 96, 256, 16
    pre = "model.language_model."
    t = {pre + "embed_tokens.weight": _r(rng, V, E),
         pre + "norm.weight": np.ones(E),
         pre + "embed_tokens_per_layer.weight": _r(rng, V, PL * L),
         pre + "per_layer_model_projection.weight": _r(rng, PL * L, E),
         pre + "per_layer_projection_norm.weight": np.ones(PL),
         "lm_head.weight": _r(rng, V, E)}
    for i in range(L):
        b = pre + f"layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, H * hd, E),
              f"{b}.self_attn.k_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.v_proj.weight": _r(rng, HKV * hd, E),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, H * hd),
              f"{b}.self_attn.q_norm.weight": np.ones(hd),
              f"{b}.self_attn.k_norm.weight": np.ones(hd),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.pre_feedforward_layernorm.weight": np.ones(E),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF),
              f"{b}.post_feedforward_layernorm.weight": np.ones(E),
              f"{b}.per_layer_input_gate.weight": _r(rng, PL, E),
              f"{b}.per_layer_projection.weight": _r(rng, E, PL),
              f"{b}.post_per_layer_input_norm.weight": np.ones(E)}
    t[pre + "layers.0.layer_scalar"] = np.asarray([0.95], np.float32)
    text = {"vocab_size": V, "hidden_size": E, "num_hidden_layers": L,
            "num_attention_heads": H, "num_key_value_heads": HKV,
            "head_dim": hd, "global_head_dim": hd,
            "intermediate_size": FF, "rms_norm_eps": 1e-6,
            "layer_types": ["sliding_attention", "full_attention"],
            "sliding_window": 8, "num_kv_shared_layers": 0,
            "hidden_size_per_layer_input": PL,
            "max_position_embeddings": 512,
            "final_logit_softcapping": 30.0,
            "rope_parameters": {
                "full_attention": {"rope_type": "proportional",
                                   "rope_theta": 1000000.0,
                                   "partial_rotary_factor": 1.0},
                "sliding_attention": {"rope_theta": 10000.0}}}
    cfg = {"architectures": ["Gemma4ForConditionalGeneration"],
           "text_config": text}
    out = _write_synth(tmp_path, "gemma4", cfg, t)
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    assert rt.cfg.arch == "gemma4"
    assert rt.cfg.layer_is_swa(0) and not rt.cfg.layer_is_swa(1)
    logits = rt.all_position_logits([3, 7, 11, 5])
    assert np.all(np.isfinite(logits))


def test_convert_gemma4_assistant_synthetic(tmp_path):
    rng = np.random.default_rng(24)
    E, BB, H, hd, L, FF, V = 48, 64, 4, 64, 2, 80, 256
    t = {"model.embed_tokens.weight": _r(rng, V, E),
         "model.norm.weight": np.ones(E),
         "pre_projection.weight": _r(rng, E, 2 * BB),
         "post_projection.weight": _r(rng, BB, E)}
    for i in range(L):
        b = f"model.layers.{i}"
        t |= {f"{b}.input_layernorm.weight": np.ones(E),
              f"{b}.self_attn.q_proj.weight": _r(rng, H * hd, E),
              f"{b}.self_attn.q_norm.weight": np.ones(hd),
              f"{b}.self_attn.o_proj.weight": _r(rng, E, H * hd),
              f"{b}.post_attention_layernorm.weight": np.ones(E),
              f"{b}.pre_feedforward_layernorm.weight": np.ones(E),
              f"{b}.mlp.gate_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.up_proj.weight": _r(rng, FF, E),
              f"{b}.mlp.down_proj.weight": _r(rng, E, FF),
              f"{b}.post_feedforward_layernorm.weight": np.ones(E)}
    t["model.layers.0.layer_scalar"] = np.asarray([0.95], np.float32)
    # ordered-centroid variant tensors: a vocab permutation + centroids
    order = rng.permutation(V).astype(np.int64)
    t["token_ordering"] = order
    t["centroids"] = _r(rng, 4, E)
    cfg = {"architectures": ["Gemma4AssistantForCausalLM"], "vocab_size": V,
           "hidden_size": E, "backbone_hidden_size": BB,
           "num_hidden_layers": L, "num_attention_heads": H,
           "num_key_value_heads": 2, "head_dim": hd,
           "intermediate_size": FF, "rms_norm_eps": 1e-6,
           "layer_types": ["sliding_attention", "full_attention"],
           "sliding_window": 8, "max_position_embeddings": 512,
           "num_centroids": 4, "centroid_intermediate_top_k": 2,
           "use_ordered_embeddings": True}
    out = _write_synth(tmp_path, "gemma4-asst", cfg, t)
    from ik_llama_cpp_tpu.gguf.reader import load_gguf
    from ik_llama_cpp_tpu.models.config import config_from_gguf
    from ik_llama_cpp_tpu.models import gemma4 as G4
    gg = load_gguf(out)
    mcfg = config_from_gguf(gg.metadata)
    assert mcfg.arch == "gemma4_mtp"
    assert mcfg.extra["mtp_backbone_n_embd"] == BB
    assert mcfg.extra["mtp_num_centroids"] == 4
    assert mcfg.extra["mtp_use_ordered_embeddings"]
    params = G4.load_gemma4_mtp_params(gg, mcfg, use_quant=False)
    assert params["mtp_pre_proj"].w.shape == (2 * BB, E)
    # the stored ordering is the inverted token->centroid table
    tord = np.asarray(params["mtp_token_ordering"]).astype(np.int64)
    inv = np.zeros(V, np.int64)
    inv[order] = np.arange(V)
    assert np.array_equal(tord.reshape(-1), inv // (V // 4))


def test_convert_deepseek4_synthetic(tmp_path):
    rng = np.random.default_rng(25)
    E, H, hd, L, V = 64, 4, 64, 2, 256
    QL, OG, OL, NE, FFE, FF = 64, 2, 8, 4, 48, 96
    hc, mix = 2, 2 * 2 + 2 * 2
    t = {"embed.weight": _r(rng, V, E), "norm.weight": np.ones(E),
         "head.weight": _r(rng, V, E),
         "hc_head_fn": _r(rng, hc, E * hc),
         "hc_head_base": _r(rng, hc) * 0.1,
         "hc_head_scale": np.asarray([0.8], np.float32)}
    for i in range(L):
        b = f"layers.{i}"
        t |= {f"{b}.attn_norm.weight": np.ones(E),
              f"{b}.ffn_norm.weight": np.ones(E),
              f"{b}.attn.wq_a.weight": _r(rng, QL, E),
              f"{b}.attn.q_norm.weight": np.ones(QL),
              f"{b}.attn.wq_b.weight": _r(rng, H * hd, QL),
              f"{b}.attn.wkv.weight": _r(rng, hd, E),
              f"{b}.attn.kv_norm.weight": np.ones(hd),
              f"{b}.attn.wo_a.weight": _r(rng, OL * OG, H * hd // OG),
              f"{b}.attn.wo_b.weight": _r(rng, E, OL * OG),
              f"{b}.attn.attn_sink": _r(rng, H) * 0.2,
              f"{b}.ffn.gate.weight": _r(rng, NE, E),
              f"{b}.ffn.gate.bias": _r(rng, NE) * 0.1,
              f"{b}.ffn.shared_experts.w1.weight": _r(rng, FFE, E),
              f"{b}.ffn.shared_experts.w3.weight": _r(rng, FFE, E),
              f"{b}.ffn.shared_experts.w2.weight": _r(rng, E, FFE)}
        for stem in ("hc_attn", "hc_ffn"):
            t |= {f"{b}.{stem}_fn": _r(rng, mix, E * hc),
                  f"{b}.{stem}_base": _r(rng, mix) * 0.1,
                  f"{b}.{stem}_scale": 0.5 + 0.2 * rng.random(3)}
        for e in range(NE):
            eb = f"{b}.ffn.experts.{e}"
            t |= {f"{eb}.w1.weight": _r(rng, FFE, E),
                  f"{eb}.w3.weight": _r(rng, FFE, E),
                  f"{eb}.w2.weight": _r(rng, E, FFE)}
    cfg = {"architectures": ["DeepseekV4ForCausalLM"], "vocab_size": V,
           "hidden_size": E, "num_hidden_layers": L,
           "num_attention_heads": H, "num_key_value_heads": 1,
           "head_dim": hd, "qk_rope_head_dim": 32,
           "q_lora_rank": QL, "kv_lora_rank": hd,
           "o_groups": OG, "o_lora_rank": OL,
           "intermediate_size": FF, "moe_intermediate_size": FFE,
           "n_routed_experts": NE, "num_experts_per_tok": 2,
           "n_shared_experts": 1, "first_k_dense_replace": 0,
           "routed_scaling_factor": 1.5, "norm_topk_prob": True,
           "scoring_func": "sqrtsoftplus", "swiglu_limit": 0.0,
           "hc_mult": hc, "hc_sinkhorn_iters": 3, "hc_eps": 1e-6,
           "rms_norm_eps": 1e-6, "rope_theta": 10000.0,
           "max_position_embeddings": 512}
    out = _write_synth(tmp_path, "deepseek4", cfg, t)
    from ik_llama_cpp_tpu.runtime.generate import Runtime
    rt = Runtime.from_gguf(out)
    assert rt.cfg.arch == "deepseek4"
    assert rt.cfg.expert_gating_func == 4
    assert rt.cfg.extra["hc_mult"] == hc
    logits = rt.all_position_logits([3, 7, 11, 5])
    assert np.all(np.isfinite(logits))
