"""Pallas fused attention for ViT-scale sequences.

XLA's unfused attention materializes the [B, H, N, N] score tensor in HBM
three times per layer (scores, softmax, probabilities) — for DeiT shapes
(N=197) that HBM traffic, not FLOPs, dominates attention time. These kernels
keep the whole per-(batch, head) problem resident in VMEM (q/k/v ≈ 100 KB,
fp32 scores ≈ 310 KB, far under the ~16 MB budget), compute the softmax in
fp32, and write only the [N, d] output — flash-attention structure without
tiling, which ViT sequence lengths don't need.

The backward pass is the standard flash recomputation: store (q, k, v, o,
row-logsumexp), rebuild P on the fly, and emit dQ/dK/dV from one kernel.
Wired into the model via ``VisionTransformer(attention_fn=...)``; numerics are
validated against the einsum reference in tests (fwd and grads).

Falls back to plain XLA einsum attention off-TPU or for shapes where fusion
cannot win (pallas_attention(..., fallback=True) or use_flash_attention()
returning False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Plain einsum attention, fp32 softmax: [B,H,N,d] each → [B,H,N,d]."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32
                                   ).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(denom)  # [N, 1]


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [N, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                                   # [N, N] fp32
    dv_ref[0] = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)        # rowsum(dO·O)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(ds, k.astype(jnp.float32),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(ds, q.astype(jnp.float32),
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32
                                    ).astype(dk_ref.dtype)


def _spec(n, d):
    return pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd(q3, k3, v3, scale):
    BH, N, D = q3.shape
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(BH,),
        in_specs=[_spec(N, D)] * 3,
        out_specs=(_spec(N, D), _spec(N, 1)),
        out_shape=(jax.ShapeDtypeStruct((BH, N, D), q3.dtype),
                   jax.ShapeDtypeStruct((BH, N, 1), jnp.float32)),
    )(q3, k3, v3)
    return o, lse


def _flash_bwd(q3, k3, v3, o3, lse, do3, scale):
    BH, N, D = q3.shape
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(BH,),
        in_specs=[_spec(N, D)] * 4 + [_spec(N, 1), _spec(N, D)],
        out_specs=(_spec(N, D), _spec(N, D), _spec(N, D)),
        out_shape=tuple(jax.ShapeDtypeStruct((BH, N, D), q3.dtype)
                        for _ in range(3)),
    )(q3, k3, v3, o3, lse, do3)


@functools.partial(jax.custom_vjp)
def _flash_attention_3d(q3, k3, v3):
    o, _ = _flash_fwd(q3, k3, v3, q3.shape[-1] ** -0.5)
    return o


def _flash_attention_3d_fwd(q3, k3, v3):
    o, lse = _flash_fwd(q3, k3, v3, q3.shape[-1] ** -0.5)
    return o, (q3, k3, v3, o, lse)


def _flash_attention_3d_bwd(res, do):
    q3, k3, v3, o, lse = res
    dq, dk, dv = _flash_bwd(q3, k3, v3, o, lse, do, q3.shape[-1] ** -0.5)
    return dq, dk, dv


_flash_attention_3d.defvjp(_flash_attention_3d_fwd, _flash_attention_3d_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Fused attention, [B, H, N, d] → [B, H, N, d], differentiable."""
    B, H, N, D = q.shape
    out = _flash_attention_3d(q.reshape(B * H, N, D), k.reshape(B * H, N, D),
                              v.reshape(B * H, N, D))
    return out.reshape(B, H, N, D)


def use_flash_attention() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def best_attention_fn(enabled: bool = True):
    """attention_fn for VisionTransformer: Pallas when available, else None
    (the model's built-in einsum path)."""
    if enabled and use_flash_attention():
        return flash_attention
    return None
