"""Gather-free bitonic sort along an axis.

XLA's ``jnp.sort`` on TPU lowers to a slow generic sort (~600 ms for the
WassKD-l1 token sorts at batch 256); a bitonic sorting network needs only
compare-exchange passes between elements at power-of-two strides, and those
partners are reachable with *reshapes and slices* — no gathers, no scatters.
Each of the ~36 stages (n=256) is one elementwise min/max pass, so the whole
sort is bandwidth-bound at a handful of ms.

Non-power-of-two lengths are padded with +inf (dropped after sorting).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _compare_exchange(x: jax.Array, j: int, asc_mask: np.ndarray) -> jax.Array:
    """One bitonic stage at stride j on the last axis.

    ``asc_mask`` [n] is True where the element's block sorts ascending; it is
    a host-side constant per stage (shapes static), broadcast over the batch.
    """
    *lead, n = x.shape
    y = x.reshape(*lead, n // (2 * j), 2, j)
    lo = y[..., 0, :]
    hi = y[..., 1, :]
    mn = jnp.minimum(lo, hi)
    mx = jnp.maximum(lo, hi)
    asc = jnp.asarray(asc_mask.reshape(n // (2 * j), 2, j)[:, 0, :])
    new_lo = jnp.where(asc, mn, mx)
    new_hi = jnp.where(asc, mx, mn)
    return jnp.stack([new_lo, new_hi], axis=-2).reshape(*lead, n)


def bitonic_sort(x: jax.Array, axis: int = -1) -> jax.Array:
    """Ascending sort along ``axis`` (values only)."""
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    n_pad = 1 << (n - 1).bit_length()
    if n_pad != n:
        pad_width = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
        big = jnp.array(np.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.iinfo(x.dtype).max
        x = jnp.pad(x, pad_width, constant_values=big)

    idx = np.arange(n_pad)
    k = 2
    while k <= n_pad:
        asc_mask = ((idx // k) % 2 == 0)  # block direction for this k-phase
        j = k // 2
        while j >= 1:
            x = _compare_exchange(x, j, asc_mask)
            j //= 2
        k *= 2

    if n_pad != n:
        x = x[..., :n]
    return jnp.moveaxis(x, -1, axis)


# -----------------------------------------------------------------------------
# Pallas variant: the whole network runs in VMEM — one read + one write of the
# tensor instead of 2 HBM passes per stage (~36 stages at n=256).
# -----------------------------------------------------------------------------

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _sort_kernel(x_ref, o_ref, *, n_pad: int):
    x = x_ref[0]  # [n_pad, d] — sort along axis 0, lanes on d
    k = 2
    while k <= n_pad:
        j = k // 2
        while j >= 1:
            m = n_pad // (2 * j)
            y = x.reshape(m, 2, j, x.shape[-1])
            lo, hi = y[:, 0], y[:, 1]
            mn = jnp.minimum(lo, hi)
            mx = jnp.maximum(lo, hi)
            # direction of the low element's block: ((blk·2j + off) // k) even
            blk = jax.lax.broadcasted_iota(jnp.int32, (m, j, 1), 0)
            off = jax.lax.broadcasted_iota(jnp.int32, (m, j, 1), 1)
            asc = ((blk * 2 * j + off) // k) % 2 == 0
            new_lo = jnp.where(asc, mn, mx)
            new_hi = jnp.where(asc, mx, mn)
            x = jnp.stack([new_lo, new_hi], axis=1).reshape(n_pad, x.shape[-1])
            j //= 2
        k *= 2
    o_ref[0] = x


def bitonic_sort_pallas(x: jax.Array, axis: int = -2) -> jax.Array:
    """Ascending sort along ``axis`` of a [..., n, d] tensor, fused in VMEM.

    Designed for the WassKD token sort ([B, N, D] along N): each grid cell
    sorts one [n_pad, d] tile. Falls back to the XLA network off-TPU."""
    if not (_HAS_PLTPU and jax.default_backend() == "tpu"):
        return bitonic_sort(x, axis=axis)
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -2)
    *lead, n, d = x.shape
    n_pad = 1 << (n - 1).bit_length()
    if n_pad != n:
        pad = [(0, 0)] * (x.ndim - 2) + [(0, n_pad - n), (0, 0)]
        big = jnp.array(np.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
            else jnp.iinfo(x.dtype).max
        x = jnp.pad(x, pad, constant_values=big)
    B = int(np.prod(lead)) if lead else 1
    x3 = x.reshape(B, n_pad, d)

    import functools

    out = pl.pallas_call(
        functools.partial(_sort_kernel, n_pad=n_pad),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, d), x.dtype),
    )(x3)
    out = out.reshape(*lead, n_pad, d)[..., :n, :]
    return jnp.moveaxis(out, -2, axis)


# -----------------------------------------------------------------------------
# Differentiable sort with a sorting-network backward.
#
# The true VJP of a sort is a permutation: scatter the cotangent back through
# the sort order. TPU scatters/gathers are pathological here (CLAUDE.md), so
# the backward *re-sorts*: carrying the original index as a payload in the
# forward gives ``order``; ascending-sorting ``order`` in the backward (with
# the cotangent as payload) restores original positions — one gather-free
# network pass instead of XLA's 36 masked replays.
#
# Measured on v5e ([128,256,384] bf16): XLA autodiff through the value-only
# network costs ~7.5 ms/grad-sort and this two-tensor payload variant ~8.0 ms
# — the (key, payload) pair traffic does not fuse across stages the way the
# value-only network does (0.6 ms forward), so carrying a second tensor loses
# exactly what the cheaper backward saves. Kept for its exact, general VJP;
# the wasskd-l1 hot path instead uses the *packed* single-int32 formulation
# below (sorted_l1_tokens), where key and payload share one tensor.
# -----------------------------------------------------------------------------


def _pair_compare_exchange(key: jax.Array, payload: jax.Array, j: int,
                           asc_mask: np.ndarray):
    """One bitonic stage at stride j, swapping (key, payload) pairs."""
    *lead, n = key.shape
    yk = key.reshape(*lead, n // (2 * j), 2, j)
    yp = payload.reshape(*lead, n // (2 * j), 2, j)
    klo, khi = yk[..., 0, :], yk[..., 1, :]
    plo, phi = yp[..., 0, :], yp[..., 1, :]
    asc = jnp.asarray(asc_mask.reshape(n // (2 * j), 2, j)[:, 0, :])
    swap = jnp.where(asc, klo > khi, klo < khi)
    new_klo = jnp.where(swap, khi, klo)
    new_khi = jnp.where(swap, klo, khi)
    new_plo = jnp.where(swap, phi, plo)
    new_phi = jnp.where(swap, plo, phi)
    k_out = jnp.stack([new_klo, new_khi], axis=-2).reshape(*lead, n)
    p_out = jnp.stack([new_plo, new_phi], axis=-2).reshape(*lead, n)
    return k_out, p_out


def _bitonic_network_pair(key: jax.Array, payload: jax.Array):
    """Run the full ascending network on ``key``, carrying ``payload``.
    Last-axis length must already be a power of two."""
    n = key.shape[-1]
    idx = np.arange(n)
    k = 2
    while k <= n:
        asc_mask = (idx // k) % 2 == 0
        j = k // 2
        while j >= 1:
            key, payload = _pair_compare_exchange(key, payload, j, asc_mask)
            j //= 2
        k *= 2
    return key, payload


def _pad_last(x: jax.Array, n_pad: int, value) -> jax.Array:
    n = x.shape[-1]
    if n_pad == n:
        return x
    pad_width = [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)]
    return jnp.pad(x, pad_width, constant_values=value)


@jax.custom_vjp
def bitonic_sort_diff(x: jax.Array) -> jax.Array:
    """Ascending sort along the LAST axis with the re-sort backward above.
    Functionally identical to ``bitonic_sort(x, axis=-1)``."""
    return bitonic_sort(x, axis=-1)


def _bsd_fwd(x):
    n = x.shape[-1]
    n_pad = 1 << (n - 1).bit_length()
    big = jnp.array(np.inf, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).max
    xp = _pad_last(x, n_pad, big)
    iota = jnp.broadcast_to(
        jnp.arange(n_pad, dtype=jnp.int32), xp.shape)
    sorted_x, order = _bitonic_network_pair(xp, iota)
    return sorted_x[..., :n], (order, n)


def _bsd_bwd(res, g):
    order, n = res
    n_pad = order.shape[-1]
    g_pad = _pad_last(g.astype(jnp.float32), n_pad, 0.0)
    # ascending sort by original index restores original positions; the
    # padded rows carry indices ≥ n and land in the dropped tail
    _, g_orig = _bitonic_network_pair(order, g_pad)
    return (g_orig[..., :n].astype(g.dtype),)


bitonic_sort_diff.defvjp(_bsd_fwd, _bsd_bwd)


def sort_tokens_diff(x: jax.Array, axis: int) -> jax.Array:
    """bitonic_sort_diff along an arbitrary axis."""
    axis = axis % x.ndim
    x = jnp.moveaxis(x, axis, -1)
    return jnp.moveaxis(bitonic_sort_diff(x), -1, axis)
