"""Pallas fused transformer MLP (matmul → GELU → matmul) for inference paths.

The unfused MLP writes the [tokens, 4D] hidden activation to HBM, reads it
back for GELU, and reads it again for the second matmul — for DeiT-Small at
batch 256 that's ~460 MB of traffic per block and the dominant cost of the
frozen-teacher forward (measured: fwd runs at 2.6× its HBM roofline). This
kernel tiles the token dimension, keeps the hidden activation in VMEM, and
streams only x in / out — ~75 MB per block.

Forward-only by design: it serves the teacher forward (no gradients flow
through the teacher, reference model/loss.py:44 no_grad) and evaluation.
Training backward for the student stays on XLA's autodiff path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_TILE_M = 256  # fits VMEM with double buffering even for fp32 inputs


def _erf(x: jax.Array) -> jax.Array:
    """Abramowitz–Stegun 7.1.26 rational erf (max abs err 1.5e-7) — Pallas TPU
    has no erf/erfc primitive."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = _gelu_exact(h).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array) -> jax.Array:
    """[..., D] → [..., D] through Dense(H) → GELU(erf) → Dense(D)."""
    orig_shape = x.shape
    D = orig_shape[-1]
    H = w1.shape[-1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    pad = (-M) % _TILE_M
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    Mp = x2.shape[0]

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(Mp // _TILE_M,),
        in_specs=[
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
    )(x2, w1.astype(x.dtype), b1.reshape(1, H).astype(x.dtype),
      w2.astype(x.dtype), b2.reshape(1, D).astype(x.dtype))
    if pad:
        out = out[:M]
    return out.reshape(orig_shape)


def reference_mlp(x, w1, b1, w2, b2):
    """Unfused reference (what flax Dense+gelu computes)."""
    h = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2.astype(x.dtype) + b2.astype(x.dtype)


def best_mlp_fn(enabled: bool = True):
    """mlp_fn for VisionTransformer inference modules, or None for XLA."""
    if enabled and _HAS_PLTPU and jax.default_backend() == "tpu":
        return fused_mlp
    return None


# -----------------------------------------------------------------------------
# Training variant: custom VJP with recompute-in-backward.
#
# Residuals store only x (the LN output); the backward kernel recomputes the
# pre-activation, applies the exact GELU derivative, emits dX per tile and
# accumulates dW1/dW2/db1/db2 in fp32 across the (sequential) grid by
# revisiting constant-index output blocks.
# -----------------------------------------------------------------------------


def _gelu_grad(x: jax.Array) -> jax.Array:
    """d/dx gelu(x) = Φ(x) + x·φ(x)."""
    inv_sqrt2pi = 0.3989422804014327
    phi = jnp.exp(-0.5 * x * x) * inv_sqrt2pi
    return 0.5 * (1.0 + _erf(x * 0.7071067811865476)) + x * phi


def _mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    i = pl.program_id(0)
    x = x_ref[...]
    dy = dy_ref[...]
    w1 = w1_ref[...]
    w2 = w2_ref[...]

    hpre = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    hpre = hpre + b1_ref[...].astype(jnp.float32)
    h = _gelu_exact(hpre)

    dy32 = dy.astype(jnp.float32)
    # dH = dY · W2ᵀ ; dHpre = dH ⊙ gelu'(H_pre)
    dh = jax.lax.dot_general(dy32, w2.astype(jnp.float32),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dhpre = dh * _gelu_grad(hpre)

    dx_ref[...] = jax.lax.dot_general(
        dhpre.astype(x.dtype), w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    dw1_tile = jax.lax.dot_general(x, dhpre.astype(x.dtype),
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    dw2_tile = jax.lax.dot_general(h.astype(x.dtype), dy,
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    db1_tile = jnp.sum(dhpre, axis=0, keepdims=True)
    db2_tile = jnp.sum(dy32, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = dw1_tile
        dw2_ref[...] = dw2_tile
        db1_ref[...] = db1_tile
        db2_ref[...] = db2_tile

    @pl.when(i > 0)
    def _():
        dw1_ref[...] += dw1_tile
        dw2_ref[...] += dw2_tile
        db1_ref[...] += db1_tile
        db2_ref[...] += db2_tile


def _fused_mlp_bwd_call(x2, w1, b1, w2, dy2):
    Mp, D = x2.shape
    H = w1.shape[-1]
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(Mp // _TILE_M,),
        in_specs=[
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, D), x2.dtype),
            jax.ShapeDtypeStruct((D, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
    )(x2, w1.astype(x2.dtype), b1.reshape(1, H).astype(x2.dtype),
      w2.astype(x2.dtype), dy2)
    return dx, dw1, db1, dw2, db2


@jax.custom_vjp
def fused_mlp_train(x, w1, b1, w2, b2):
    """Differentiable fused MLP (training path for the student)."""
    return fused_mlp(x, w1, b1, w2, b2)


def _fused_mlp_train_fwd(x, w1, b1, w2, b2):
    return fused_mlp(x, w1, b1, w2, b2), (x, w1, b1, w2)


def _fused_mlp_train_bwd(res, dy):
    x, w1, b1, w2 = res
    orig_shape = x.shape
    D = orig_shape[-1]
    x2 = x.reshape(-1, D)
    dy2 = dy.reshape(-1, D)
    M = x2.shape[0]
    pad = (-M) % _TILE_M
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, pad), (0, 0)))
    dx, dw1, db1, dw2, db2 = _fused_mlp_bwd_call(x2, w1, b1, w2, dy2)
    if pad:
        dx = dx[:M]
    return (dx.reshape(orig_shape), dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[0].astype(w2.dtype))


fused_mlp_train.defvjp(_fused_mlp_train_fwd, _fused_mlp_train_bwd)


def best_train_mlp_fn(enabled: bool = True):
    """Differentiable fused MLP for training modules, or None for XLA."""
    if enabled and _HAS_PLTPU and jax.default_backend() == "tpu":
        return fused_mlp_train
    return None
