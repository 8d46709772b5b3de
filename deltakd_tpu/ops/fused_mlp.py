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
