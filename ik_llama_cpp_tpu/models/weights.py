"""Weight containers + GGUF -> device loading.

The TPU analogue of llm_load_tensors (src/llama.cpp:4133) +
create_tensors_helper (src/llama-load-tensors.cpp): tensors are enumerated
from GGUF, matmul weights are planar-decoded (quant/planar.py) into
(int8 codes [K,N], f32 scales [K//G,N]) device arrays — the load-time repack
that replaces `-rtr`/iqk_repack_tensor — while embeddings/norms are
dequantized to dense arrays.

QLinear / DenseLinear are pytree nodes so whole models are jit-traceable.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModel, GGUFTensorInfo
from ..quant.dequant import dequantize
from ..quant.planar import PLANAR_FNS, planar_decode
from ..ops.qmatmul import (qmatmul, qmatmul_ref, qmatmul4,
                           qmatmul4_ref, pack_int4, qmatmul_i8,
                           qmatmul_i8_mxu, qmatmul_i8_ref,
                           quantize_activations, requant_supergroup,
                           SUPERGROUP, I8_MXU_MIN_M)


@jax.tree_util.register_pytree_node_class
@dataclass
class QLinear:
    """Planar-quantized linear layer: y = x @ dequant(codes, scale, bias)."""

    codes: Any   # int8 (K, N)
    scale: Any   # f32 (K//G, N)
    bias: Any    # f32 (K//G, N) | None
    group: int = 32

    def tree_flatten(self):
        return (self.codes, self.scale, self.bias), (self.group,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, scale, bias = children
        return cls(codes, scale, bias, group=aux[0])

    @property
    def shape(self):
        return (self.codes.shape[0], self.codes.shape[1])

    def __call__(self, x, *, interpret: bool = False):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if _use_pallas():
            from ..ops import tuning
            cfg = tuning.get("qmatmul", x2.shape[0], *self.codes.shape)
            y = qmatmul(x2, self.codes, self.scale, self.bias, group=self.group,
                        interpret=interpret, **cfg)
        else:
            # XLA-CPU path with identical numerics (kernel == oracle is
            # separately proven by tests/test_qmatmul.py)
            y = qmatmul_ref(x2, self.codes, self.scale, self.bias, group=self.group)
        return y.reshape(orig_shape[:-1] + (self.codes.shape[1],))


@jax.tree_util.register_pytree_node_class
@dataclass
class QLinearI4:
    """4-bit-packed planar linear: two code indices per byte along K, an
    optional static 16-entry codebook — half the HBM traffic of QLinear for
    4-bit-class formats (the TG-decisive saving; cf. mmvq.cu's native 4-bit
    kernels)."""

    packed: Any          # uint8 (K//2, N)
    scale: Any           # f32 (K//group, N)
    bias: Any            # f32 (K//group, N) | None
    group: int = 32
    lut16: tuple | None = None   # static codebook; None = idx-8

    def tree_flatten(self):
        return (self.packed, self.scale, self.bias), (self.group, self.lut16)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, scale, bias = children
        return cls(packed, scale, bias, group=aux[0], lut16=aux[1])

    @property
    def shape(self):
        return (self.packed.shape[0] * 2, self.packed.shape[1])

    def __call__(self, x, *, interpret: bool = False):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if _use_pallas():
            y = qmatmul4(x2, self.packed, self.scale, self.bias,
                         group=self.group, lut16=self.lut16,
                         interpret=interpret)
        else:
            y = qmatmul4_ref(x2, self.packed, self.scale, self.bias,
                             group=self.group, lut16=self.lut16)
        return y.reshape(orig_shape[:-1] + (self.packed.shape[1],))


@jax.tree_util.register_pytree_node_class
@dataclass
class QLinearI8:
    """int8 x int8 MXU linear: weights re-coded per supergroup-256 column,
    activations quantized per (row, supergroup) on the fly — removes the
    per-weight VPU dequant chain entirely (the v5e decode ceiling, see
    PERF_NOTES.md) and runs the MXU at its doubled int8 rate for prefill.
    TPU analogue of the reference's Q8_K activation quantization + int8
    SIMD GEMM (iqk_mul_mat.cpp:246-308).

    Per-group-32 bias formats add groupsum(x) @ bias outside the int8 dot
    (exact, ~3% extra FLOPs)."""

    codes: Any   # int8 (K, N) supergroup-requantized
    sw: Any      # f32 (K//256, N)
    gbias: Any   # bf16 (K//group, N) | None
    group: int = 32

    def tree_flatten(self):
        return (self.codes, self.sw, self.gbias), (self.group,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        codes, sw, gbias = children
        return cls(codes, sw, gbias, group=aux[0])

    @property
    def shape(self):
        return (self.codes.shape[0], self.codes.shape[1])

    def __call__(self, x, *, interpret: bool = False):
        orig_shape = x.shape
        k = orig_shape[-1]
        x2 = x.reshape(-1, k)
        xq, xs = quantize_activations(x2)
        if x2.shape[0] >= I8_MXU_MIN_M and _use_pallas():
            # prefill: Pallas MXU kernel — the XLA einsum materializes its
            # (G, M, N) int32 partials inside fused model graphs at large M
            # (PP512 8040 -> 3580 t/s measured before this dispatch)
            y = qmatmul_i8_mxu(xq, xs.T, self.codes, self.sw,
                               interpret=interpret)
        else:
            # decode/verify: the supergroup-batched native int8 dot streams
            # weights at HBM peak (tools/microbench_i8m.py)
            y = qmatmul_i8(xq, xs, self.codes, self.sw)
        if self.gbias is not None:
            xg = x2.astype(jnp.float32).reshape(-1, k // self.group,
                                                self.group).sum(axis=2)
            y = y + jnp.dot(xg.astype(jnp.bfloat16), self.gbias,
                            preferred_element_type=jnp.float32)
        return y.reshape(orig_shape[:-1] + (self.codes.shape[1],))


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseLinear:
    """bf16 dense linear (f16/f32/bf16 GGUF tensors, or non-planar fallback)."""

    w: Any  # bf16 (K, N)

    def tree_flatten(self):
        return (self.w,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.w.shape

    def __call__(self, x, *, interpret: bool = False):
        return jnp.dot(x.astype(jnp.bfloat16), self.w,
                       preferred_element_type=jnp.float32)


@jax.tree_util.register_pytree_node_class
@dataclass
class LoraLinear:
    """Low-rank adapted linear: y = base(x) + scale * (x @ a) @ b.

    The runtime analogue of llm_build_lora_mm (src/llama.cpp): LoRA deltas
    stay separate matmuls so quantized base weights are untouched. a: (K, r),
    b: (r, N); scale = alpha/rank * user_scale, a traced leaf so adapter
    rescaling (/lora-adapters) does not recompile."""

    base: Any
    a: Any
    b: Any
    scale: Any

    def tree_flatten(self):
        return (self.base, self.a, self.b, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.base.shape

    def __call__(self, x, *, interpret: bool = False):
        y = self.base(x, interpret=interpret)
        xa = jnp.dot(x.astype(jnp.bfloat16), self.a,
                     preferred_element_type=jnp.float32)
        delta = jnp.dot(xa.astype(jnp.bfloat16), self.b,
                        preferred_element_type=jnp.float32)
        return y + delta * self.scale


_FLOAT_TYPES = {GGMLType.F32, GGMLType.F16, GGMLType.BF16}

# 4-bit weight packing: verified bit-accurate on TPU v5e, but measured
# SLOWER for decode than the int8 planar path (41 vs 58 t/s on the 8B
# bench): dequant is VPU-throughput-bound (~300G weights/s on v5e for any
# per-weight unpack chain — see PERF_NOTES.md), so halving HBM bytes does
# not help while the extra nibble unpacking costs VPU cycles. Prefill
# gains (+36%) don't outweigh the decode loss; OFF by default.
_PACK_INT4 = False


def set_pack_int4(flag: bool) -> None:
    """Toggle 4-bit weight packing at load."""
    global _PACK_INT4
    _PACK_INT4 = flag


# int8 x int8 MXU path with on-the-fly activation quantization (QLinearI8).
# Numerically a re-quantization (supergroup-256 weight recode + int8
# activations — exactly the reference's Q8_K trick, iqk_mul_mat.cpp:246-308,
# which is ITS default for every quantized matmul too). DEFAULT ON for the
# TPU backend: measured at HBM peak for decode (824 GB/s vs 535 for the
# bf16-dequant Pallas path) and 2x MXU rate for prefill. CPU/test runs keep
# the exact planar numerics. None = auto (backend-based); env IK_I8_MXU=0/1
# overrides.
_I8_MXU: bool | None = None


def set_i8_mxu(flag: bool | None) -> None:
    """Force (or reset with None = auto) the int8 MXU weight path at load."""
    global _I8_MXU
    _I8_MXU = flag


def _i8_mxu_enabled() -> bool:
    import os
    env = os.environ.get("IK_I8_MXU")
    if env is not None:
        return env not in ("0", "false", "")
    if _I8_MXU is None:
        return _use_pallas()     # TPU backend
    return _I8_MXU

_USE_PALLAS: bool | None = None


def _use_pallas() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = jax.default_backend() not in ("cpu",)
    return _USE_PALLAS


def set_use_pallas(flag: bool | None) -> None:
    """Force (or reset with None) the matmul implementation choice."""
    global _USE_PALLAS
    _USE_PALLAS = flag


def dequant_tensor(info: GGUFTensorInfo) -> np.ndarray:
    """Full f32 numpy dequantization in the tensor's logical (row-major) shape."""
    n_per_row = info.shape[0]
    nrows = info.n_elements // n_per_row
    out = dequantize(info.data, info.ggml_type, n_per_row)
    logical = tuple(reversed(info.shape))
    return out.reshape(logical)


def load_linear(info: GGUFTensorInfo, *, use_quant: bool = True) -> QLinear | DenseLinear:
    """GGUF weight (ne = (K, N) i.e. rows are output neurons) -> device linear.

    Planar codes arrive row-major (N, K); we transpose to (K, N) so the
    contraction dim is leading, which is what the kernel streams.
    """
    k = info.shape[0]
    n = info.n_elements // k
    if use_quant and info.ggml_type in PLANAR_FNS:
        # native C++ decoder when built (bit-identical; ~50x faster at load)
        from ..native import planar_decode_native
        nat = planar_decode_native(info.data, info.ggml_type, k)
        if nat is not None:
            codes_np, scale_np, bias_np, group = nat
        else:
            pw = planar_decode(info.data, info.ggml_type, k)
            codes_np, scale_np, bias_np, group = pw.codes, pw.scale, pw.bias, pw.group
        codes_t = np.ascontiguousarray(codes_np.T)                     # (K, N)
        # scales/biases stored bf16 in HBM: the matmul kernels round them to
        # bf16 in-register anyway (qmatmul_ref contract), so this is
        # numerically identical while cutting scale traffic in half —
        # 12.5% (G=32) / 25% (G=16) of code bytes down to 6.25% / 12.5%
        scale = jnp.asarray(np.ascontiguousarray(scale_np.T),
                            jnp.bfloat16)                              # (K//G, N)
        bias = None if bias_np is None else jnp.asarray(
            np.ascontiguousarray(bias_np.T), jnp.bfloat16)
        p4 = pack_int4(codes_t) if _PACK_INT4 else None
        if p4 is not None:
            packed, lut = p4
            return QLinearI4(jnp.asarray(packed), scale, bias, group=group,
                             lut16=lut)
        if _i8_mxu_enabled() and k % SUPERGROUP == 0:
            q8, sw = requant_supergroup(codes_np.T, scale_np.T, group=group)
            return QLinearI8(jnp.asarray(np.ascontiguousarray(q8)),
                             jnp.asarray(sw), bias, group=group)
        return QLinear(jnp.asarray(codes_t), scale, bias, group=group)
    w = dequant_tensor(info).reshape(n, k).T  # (K, N)
    return DenseLinear(jnp.asarray(np.ascontiguousarray(w), dtype=jnp.bfloat16))


def load_dense(info: GGUFTensorInfo, dtype=jnp.float32) -> jax.Array:
    return jnp.asarray(dequant_tensor(info), dtype=dtype)


def scale_linear(lin, s):
    """Fold a scalar (or per-output-channel) multiplier into a linear — the
    load-time equivalent of bitnet's post-matmul ggml_scale/ggml_mul with
    the *.scale tensors (build_bitnet.cpp:32-115). ``s`` is a scalar or a
    1-D (N,) array broadcast over output channels."""
    import numpy as _np
    s = jnp.asarray(s, jnp.float32).reshape(-1)   # () or (N,)

    def _mul(a):
        # multiply in f32, store back in the array's dtype (bf16 scales)
        if a is None:
            return None
        out = a.astype(jnp.float32) * (s[None, :] if s.size > 1 else s[0])
        return out.astype(a.dtype)

    if isinstance(lin, QLinearI4):
        return QLinearI4(lin.packed, _mul(lin.scale), _mul(lin.bias),
                         lin.group, lin.lut16)
    if isinstance(lin, QLinearI8):
        return QLinearI8(lin.codes, _mul(lin.sw), _mul(lin.gbias), lin.group)
    if isinstance(lin, QLinear):
        return QLinear(lin.codes, _mul(lin.scale), _mul(lin.bias), lin.group)
    w = lin.w.astype(jnp.float32) * (s[None, :] if s.size > 1 else s[0])
    return DenseLinear(w.astype(lin.w.dtype))


def fuse_linears(linears: list) -> "QLinear | DenseLinear | None":
    """Concatenate linears along the output dim into ONE matmul — the
    load-time analogue of the reference's merge-qkv / merge-up-gate
    (llama-load-tensors.cpp): fewer, larger MXU dispatches (the TG hot path
    is dispatch-bound once HBM is saturated). Returns None if the linears
    are not fusable (mixed kinds / mismatched K or group)."""
    if all(isinstance(l, QLinearI4) for l in linears):
        k = linears[0].packed.shape[0]
        g, lut = linears[0].group, linears[0].lut16
        if any(l.packed.shape[0] != k or l.group != g or l.lut16 != lut
               for l in linears):
            return None
        has_bias = [l.bias is not None for l in linears]
        if any(has_bias) and not all(has_bias):
            return None
        return QLinearI4(
            jnp.concatenate([l.packed for l in linears], axis=1),
            jnp.concatenate([l.scale for l in linears], axis=1),
            jnp.concatenate([l.bias for l in linears], axis=1)
            if all(has_bias) else None,
            group=g, lut16=lut)
    if all(isinstance(l, QLinearI8) for l in linears):
        k = linears[0].codes.shape[0]
        g = linears[0].group
        if any(l.codes.shape[0] != k or l.group != g for l in linears):
            return None
        has_b = [l.gbias is not None for l in linears]
        if any(has_b) and not all(has_b):
            return None
        return QLinearI8(
            jnp.concatenate([l.codes for l in linears], axis=1),
            jnp.concatenate([l.sw for l in linears], axis=1),
            jnp.concatenate([l.gbias for l in linears], axis=1)
            if all(has_b) else None,
            group=g)
    if all(isinstance(l, QLinear) for l in linears):
        k = linears[0].codes.shape[0]
        g = linears[0].group
        if any(l.codes.shape[0] != k or l.group != g for l in linears):
            return None
        has_bias = [l.bias is not None for l in linears]
        if any(has_bias) and not all(has_bias):
            return None
        return QLinear(
            jnp.concatenate([l.codes for l in linears], axis=1),
            jnp.concatenate([l.scale for l in linears], axis=1),
            jnp.concatenate([l.bias for l in linears], axis=1)
            if all(has_bias) else None,
            group=g)
    if all(isinstance(l, DenseLinear) for l in linears):
        k = linears[0].w.shape[0]
        if any(l.w.shape[0] != k for l in linears):
            return None
        return DenseLinear(jnp.concatenate([l.w for l in linears], axis=1))
    return None
