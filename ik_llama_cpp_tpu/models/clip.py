"""CLIP/SigLIP vision encoder + multimodal projector — the TPU analogue of
examples/mtmd/clip.cpp.

Loads mmproj GGUF files (``clip.vision.*`` metadata, ``v.*`` tensors,
``mm.*`` projector; names per examples/mtmd/clip-impl.h): pre-LN ViT with
optional class token, learned position embeddings, quickgelu/gelu MLP, then
a projector (llava MLP ``mm.0/mm.2``, gemma3 ``mm.input_projection``,
idefics3 ``mm.model.fc``) mapping patch features into the text model's
embedding space. Image preprocessing (resize + normalize) mirrors
clip_image_preprocess.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFModel, load_gguf
from ..models.weights import dequant_tensor


@dataclass(frozen=True)
class ClipConfig:
    image_size: int
    patch_size: int
    n_embd: int
    n_head: int
    n_ff: int
    n_layer: int
    eps: float
    proj_dim: int
    projector_type: str
    use_gelu: bool          # False = quickgelu (CLIP default)
    image_mean: tuple
    image_std: tuple
    has_class_embd: bool = True


def _get(md, key, default=None):
    v = md.get(key, default)
    if hasattr(v, "item"):
        v = v.item()
    return v


def clip_config_from_gguf(md: dict) -> ClipConfig:
    g = lambda k, d=None: _get(md, f"clip.vision.{k}", d)
    mean = md.get("clip.vision.image_mean", [0.48145466, 0.4578275, 0.40821073])
    std = md.get("clip.vision.image_std", [0.26862954, 0.26130258, 0.27577711])
    return ClipConfig(
        image_size=int(g("image_size", 224)),
        patch_size=int(g("patch_size", 14)),
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        proj_dim=int(g("projection_dim", 0)),
        projector_type=str(_get(md, "clip.projector_type", "mlp")),
        use_gelu=bool(_get(md, "clip.use_gelu", False)),
        image_mean=tuple(float(x) for x in np.asarray(mean).reshape(-1)),
        image_std=tuple(float(x) for x in np.asarray(std).reshape(-1)),
    )


def _t(t, name):
    return jnp.asarray(np.ascontiguousarray(dequant_tensor(t[name])),
                       jnp.float32)


def load_clip_params(gg: GGUFModel, cfg: ClipConfig):
    t = gg.tensors
    p: dict[str, Any] = {}
    # patch conv: logical (n_embd, 3, ps, ps)
    pe = dequant_tensor(t["v.patch_embd.weight"])
    p["patch_w"] = jnp.asarray(pe.reshape(cfg.n_embd, 3, cfg.patch_size,
                                          cfg.patch_size), jnp.float32)
    if "v.patch_embd.bias" in t:
        p["patch_b"] = _t(t, "v.patch_embd.bias")
    if "v.class_embd" in t:
        p["class_embd"] = _t(t, "v.class_embd")
    p["pos_embd"] = _t(t, "v.position_embd.weight")
    for pre in ("pre_ln", "post_ln"):
        if f"v.{pre}.weight" in t:
            p[pre] = (_t(t, f"v.{pre}.weight"), _t(t, f"v.{pre}.bias"))
    blocks = []
    for i in range(cfg.n_layer):
        b = {}
        for key, tn in (("wq", "attn_q"), ("wk", "attn_k"), ("wv", "attn_v"),
                        ("wo", "attn_out"), ("ffn_up", "ffn_up"),
                        ("ffn_down", "ffn_down")):
            b[key] = _t(t, f"v.blk.{i}.{tn}.weight").T    # (in, out)
            bias_name = f"v.blk.{i}.{tn}.bias"
            if bias_name in t:
                b[key + "_b"] = _t(t, bias_name)
        for key, tn in (("ln1", "ln1"), ("ln2", "ln2")):
            b[key] = (_t(t, f"v.blk.{i}.{tn}.weight"),
                      _t(t, f"v.blk.{i}.{tn}.bias"))
        blocks.append(b)
    p["blocks"] = blocks
    # projector variants (clip-impl.h TN_LLAVA_PROJ / TN_MM_INP_PROJ / TN_MM_PROJECTOR)
    if "mm.0.weight" in t:
        p["proj"] = [(_t(t, "mm.0.weight").T, _t(t, "mm.0.bias"))]
        if "mm.2.weight" in t:
            p["proj"].append((_t(t, "mm.2.weight").T, _t(t, "mm.2.bias")))
    elif "mm.input_projection.weight" in t:
        p["proj"] = [(_t(t, "mm.input_projection.weight").T, None)]
    elif "mm.model.fc.weight" in t:
        p["proj"] = [(_t(t, "mm.model.fc.weight").T, None)]
    else:
        p["proj"] = []
    return p


def _layer_norm(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _act(x, use_gelu):
    if use_gelu:
        return jax.nn.gelu(x, approximate=True)
    return x * jax.nn.sigmoid(1.702 * x)    # quickgelu


def clip_forward(p, cfg: ClipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: (3, H, W) f32 normalized. Returns (n_tokens, proj_dim)."""
    ps = cfg.patch_size
    n_side = cfg.image_size // ps
    # patchify as a strided conv: (3,H,W) -> (n_patches, n_embd)
    x = jax.lax.conv_general_dilated(
        pixels[None], p["patch_w"], window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]    # (E, n, n)
    x = x.reshape(cfg.n_embd, n_side * n_side).T          # (P, E)
    if "patch_b" in p:
        x = x + p["patch_b"]
    if "class_embd" in p:
        x = jnp.concatenate([p["class_embd"][None], x], axis=0)
    x = x + p["pos_embd"][: x.shape[0]]
    if "pre_ln" in p:
        x = _layer_norm(x, *p["pre_ln"], cfg.eps)

    h, d = cfg.n_head, cfg.n_embd // cfg.n_head
    scale = 1.0 / np.sqrt(d)
    for b in p["blocks"]:
        res = x
        y = _layer_norm(x, *b["ln1"], cfg.eps)
        q = y @ b["wq"] + b.get("wq_b", 0.0)
        k = y @ b["wk"] + b.get("wk_b", 0.0)
        v = y @ b["wv"] + b.get("wv_b", 0.0)
        n = y.shape[0]
        q = q.reshape(n, h, d).transpose(1, 0, 2)
        k = k.reshape(n, h, d).transpose(1, 0, 2)
        v = v.reshape(n, h, d).transpose(1, 0, 2)
        att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * scale, axis=-1)
        y = (att @ v).transpose(1, 0, 2).reshape(n, cfg.n_embd)
        y = y @ b["wo"] + b.get("wo_b", 0.0)
        x = res + y
        res = x
        y = _layer_norm(x, *b["ln2"], cfg.eps)
        y = _act(y @ b["ffn_up"] + b.get("ffn_up_b", 0.0), cfg.use_gelu)
        y = y @ b["ffn_down"] + b.get("ffn_down_b", 0.0)
        x = res + y

    if "post_ln" in p:
        x = _layer_norm(x, *p["post_ln"], cfg.eps)
    if "class_embd" in p:       # llava projector drops the class token
        x = x[1:]
    for i, (w, bias) in enumerate(p["proj"]):
        x = x @ w
        if bias is not None:
            x = x + bias
        if i + 1 < len(p["proj"]):
            x = jax.nn.gelu(x, approximate=False)
    return x


def preprocess_image(img, cfg: ClipConfig) -> np.ndarray:
    """PIL image / (H, W, 3) uint8 array -> normalized (3, S, S) f32
    (clip_image_preprocess: bicubic resize + mean/std normalize)."""
    from PIL import Image
    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB").resize((cfg.image_size, cfg.image_size),
                                    Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0        # (S, S, 3)
    mean = np.asarray(cfg.image_mean, np.float32)
    std = np.asarray(cfg.image_std, np.float32)
    arr = (arr - mean) / std
    return arr.transpose(2, 0, 1)


class ClipEncoder:
    """Loaded mmproj: encode() images into text-embedding-space tokens."""

    def __init__(self, path):
        gg = load_gguf(path)
        self.cfg = clip_config_from_gguf(gg.metadata)
        self.params = load_clip_params(gg, self.cfg)
        self._fwd = jax.jit(lambda p, px: clip_forward(p, self.cfg, px))

    @property
    def n_patch_tokens(self) -> int:
        n = (self.cfg.image_size // self.cfg.patch_size) ** 2
        return n

    def encode(self, img) -> np.ndarray:
        px = jnp.asarray(preprocess_image(img, self.cfg))
        return np.asarray(self._fwd(self.params, px), np.float32)


# ---------------------------------------------------------------------------
# Whisper-style audio encoder (clip.cpp build_whisper_enc)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class AudioConfig:
    """``clip.audio.*`` hparams (clip.cpp load_hparams, is_audio branch)."""
    n_mel: int
    n_embd: int
    n_head: int
    n_ff: int
    n_layer: int
    eps: float
    proj_dim: int
    projector_type: str      # ultravox | qwen2a | voxtral
    stack_factor: int        # ultravox/voxtral StackAudioFrames
    ffn_op: str              # gelu | silu | gelu_quick (KEY_USE_GELU/SILU)


def audio_config_from_gguf(md: dict) -> AudioConfig:
    g = lambda k, d=None: _get(md, f"clip.audio.{k}", d)
    # audio projectors (ultravox/qwen2a/voxtral) force FFN_GELU_ERF
    # regardless of clip.use_gelu/use_silu (clip.cpp:3412)
    ffn_op = "gelu_erf"
    return AudioConfig(
        n_mel=int(g("num_mel_bins", 128)),
        n_embd=int(g("embedding_length")),
        n_head=int(g("attention.head_count")),
        n_ff=int(g("feed_forward_length")),
        n_layer=int(g("block_count")),
        eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        proj_dim=int(g("projection_dim", 0)),
        projector_type=str(_get(md, "clip.audio.projector_type",
                                _get(md, "clip.projector_type", "qwen2a"))),
        stack_factor=int(g("projector.stack_factor", 0)),
        ffn_op=ffn_op,
    )


def load_audio_params(gg: GGUFModel, cfg: AudioConfig):
    """``a.*`` tensors + audio projector (clip.cpp load_tensors
    PROJECTOR_TYPE_ULTRAVOX/QWEN2A/VOXTRAL cases)."""
    t = gg.tensors
    p: dict[str, Any] = {}
    # conv1d weights: ggml ne (kernel, in_ch, out_ch) -> numpy (out, in, k)
    for i in (1, 2):
        w = dequant_tensor(t[f"a.conv1d.{i}.weight"])
        p[f"conv{i}_w"] = jnp.asarray(np.ascontiguousarray(w), jnp.float32)
        # bias stored ggml-ne (1, out) so ggml_add can repeat it over frames
        p[f"conv{i}_b"] = _t(t, f"a.conv1d.{i}.bias").reshape(-1)
    p["pos_embd"] = _t(t, "a.position_embd.weight")
    if "a.post_ln.weight" in t:
        p["post_ln"] = (_t(t, "a.post_ln.weight"), _t(t, "a.post_ln.bias"))
    blocks = []
    for i in range(cfg.n_layer):
        b = {}
        for key, tn in (("wq", "attn_q"), ("wk", "attn_k"), ("wv", "attn_v"),
                        ("wo", "attn_out"), ("ffn_up", "ffn_up"),
                        ("ffn_down", "ffn_down")):
            b[key] = _t(t, f"a.blk.{i}.{tn}.weight").T     # (in, out)
            bias_name = f"a.blk.{i}.{tn}.bias"
            if bias_name in t:
                b[key + "_b"] = _t(t, bias_name)
        for key in ("ln1", "ln2"):
            b[key] = (_t(t, f"a.blk.{i}.{key}.weight"),
                      _t(t, f"a.blk.{i}.{key}.bias"))
        blocks.append(b)
    p["blocks"] = blocks
    pt = cfg.projector_type
    if pt == "ultravox":
        p["mm_norm_pre"] = _t(t, "mm.a.norm_pre.weight")
        p["mm_norm_mid"] = _t(t, "mm.a.norm_mid.weight")
        p["mm_1"] = _t(t, "mm.a.mlp.1.weight").T
        p["mm_2"] = _t(t, "mm.a.mlp.2.weight").T
    elif pt == "qwen2a":
        p["mm_fc"] = _t(t, "mm.a.fc.weight").T
        p["mm_fc_b"] = _t(t, "mm.a.fc.bias")
    elif pt == "voxtral":
        p["mm_1"] = _t(t, "mm.a.mlp.1.weight").T
        p["mm_2"] = _t(t, "mm.a.mlp.2.weight").T
    else:
        raise ValueError(f"unknown audio projector type {pt!r}")
    return p


def _gelu_erf(x):
    return jax.nn.gelu(x, approximate=False)


_FFN_ACTS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_erf": _gelu_erf,
    "gelu_quick": lambda x: x * jax.nn.sigmoid(1.702 * x),
    "silu": jax.nn.silu,
}


def whisper_forward(p, cfg: AudioConfig, mel: jnp.ndarray) -> jnp.ndarray:
    """mel: (n_mel, n_frames) normalized log-mel chunk -> (n_tokens,
    proj_dim) embeddings (clip.cpp build_whisper_enc: conv1d x2 + gelu_erf,
    ViT, optional avgpool/frame-stacking, audio projector)."""
    # conv1d block: 'same' pad 1, strides 1 then 2 (ggml_conv_1d_ph)
    x = jax.lax.conv_general_dilated(
        mel[None], p["conv1_w"], window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))[0] + p["conv1_b"][:, None]
    x = _gelu_erf(x)
    x = jax.lax.conv_general_dilated(
        x[None], p["conv2_w"], window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))[0] + p["conv2_b"][:, None]
    x = _gelu_erf(x)
    x = x.T                                               # (n_pos, E)

    x = x + p["pos_embd"][: x.shape[0]]
    h, d = cfg.n_head, cfg.n_embd // cfg.n_head
    scale = 1.0 / np.sqrt(d)
    act = _FFN_ACTS[cfg.ffn_op]
    for b in p["blocks"]:
        res = x
        y = _layer_norm(x, *b["ln1"], cfg.eps)
        q = y @ b["wq"] + b.get("wq_b", 0.0)
        k = y @ b["wk"] + b.get("wk_b", 0.0)    # whisper: no k bias
        v = y @ b["wv"] + b.get("wv_b", 0.0)
        n = y.shape[0]
        q = q.reshape(n, h, d).transpose(1, 0, 2)
        k = k.reshape(n, h, d).transpose(1, 0, 2)
        v = v.reshape(n, h, d).transpose(1, 0, 2)
        att = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * scale, axis=-1)
        y = (att @ v).transpose(1, 0, 2).reshape(n, cfg.n_embd)
        y = y @ b["wo"] + b.get("wo_b", 0.0)
        x = res + y
        res = x
        y = _layer_norm(x, *b["ln2"], cfg.eps)
        y = act(y @ b["ffn_up"] + b.get("ffn_up_b", 0.0))
        y = y @ b["ffn_down"] + b.get("ffn_down_b", 0.0)
        x = res + y

    if cfg.projector_type in ("qwen2a", "voxtral"):       # audio_has_avgpool
        n2 = (x.shape[0] // 2) * 2
        x = x[:n2].reshape(n2 // 2, 2, cfg.n_embd).mean(axis=1)
    if "post_ln" in p:
        x = _layer_norm(x, *p["post_ln"], cfg.eps)

    if cfg.projector_type in ("ultravox", "voxtral") and cfg.stack_factor:
        # StackAudioFrames: flatten row-major, zero-pad to a multiple of
        # n_embd*stack_factor, regroup
        stride = cfg.n_embd * cfg.stack_factor
        flat = x.reshape(-1)
        pad = (-flat.shape[0]) % stride
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
        x = flat.reshape(-1, stride)

    pt = cfg.projector_type
    if pt == "ultravox":
        x = L_rms(x) * p["mm_norm_pre"]
        x = x @ p["mm_1"]
        a, bb = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.silu(bb)                # swiglu_swapped: silu(2nd half)
        x = L_rms(x) * p["mm_norm_mid"]
        x = x @ p["mm_2"]
    elif pt == "qwen2a":
        x = x @ p["mm_fc"] + p["mm_fc_b"]
    else:                                      # voxtral
        x = x @ p["mm_1"]
        x = _gelu_erf(x)
        x = x @ p["mm_2"]
    return x


def L_rms(x, eps: float = 1e-6):
    return x * jax.lax.rsqrt((x * x).mean(-1, keepdims=True) + eps)


class AudioEncoder:
    """Loaded audio mmproj: encode() 16 kHz mono samples into
    text-embedding-space tokens (all 3000-frame chunks concatenated)."""

    def __init__(self, path):
        gg = load_gguf(path)
        if not _get(gg.metadata, "clip.has_audio_encoder", False):
            raise ValueError(f"{path} has no audio encoder")
        self.cfg = audio_config_from_gguf(gg.metadata)
        self.params = load_audio_params(gg, self.cfg)
        self._fwd = jax.jit(lambda p, m: whisper_forward(p, self.cfg, m))

    def encode(self, samples: np.ndarray) -> np.ndarray:
        from ..runtime.mtmd_audio import preprocess_audio
        chunks = preprocess_audio(np.asarray(samples, np.float32))
        if not chunks:
            raise ValueError("audio shorter than one hop")
        outs = [np.asarray(self._fwd(self.params, jnp.asarray(c)),
                           np.float32) for c in chunks]
        return np.concatenate(outs, axis=0)
