"""Log-domain Sinkhorn divergence with ε-scaling, XLA-native.

The reference's WassKD 'sinkhorn' mode calls ``geomloss.SamplesLoss("sinkhorn",
blur=0.05)`` per sample over token point clouds (reference model/loss.py:200-223)
— a CUDA/KeOps dependency that is not even installable from the reference's own
requirements (SURVEY.md bug B3). Here the debiased entropic-OT divergence is a
fixed-length log-domain loop (``lax.scan``) that vmaps over the batch and
compiles to dense MXU matmuls/logsumexps — no dynamic control flow.

Conventions follow geomloss: for p=2 the ground cost is C(x,y) = |x-y|²/2, the
temperature is ε = blur^p, and the returned value is the debiased divergence
S_ε(a,b) = OT_ε(a,b) − ½OT_ε(a,a) − ½OT_ε(b,b) with uniform weights (≥ 0,
vanishing at a = b). Like geomloss, convergence at small ε uses ε-scaling: the
temperature anneals geometrically from the cost diameter down to ε (the
annealing values are traced scalars; only the level *count* is static, so one
compilation serves all inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _cost(x: jax.Array, y: jax.Array) -> jax.Array:
    """Half squared Euclidean cost matrix [N, M] (geomloss p=2 convention)."""
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    xy = x @ y.T
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0) / 2.0


def _eps_schedule(diameter: jax.Array, eps: float, n_levels: int,
                  n_final: int) -> jax.Array:
    """Geometric anneal diameter → eps over n_levels, then n_final refinements."""
    d = jnp.maximum(diameter, eps)
    ts = jnp.linspace(0.0, 1.0, n_levels)
    anneal = jnp.exp(jnp.log(d) + ts * (jnp.log(eps) - jnp.log(d)))
    return jnp.concatenate([anneal, jnp.full((n_final,), eps)])


def _ot_dual(C: jax.Array, eps_seq: jax.Array) -> jax.Array:
    """Sinkhorn with uniform marginals over an ε schedule; returns the dual
    objective <a,f> + <b,g> (= entropic OT value at convergence)."""
    n, m = C.shape
    log_a = -jnp.log(n)
    log_b = -jnp.log(m)
    f = jnp.zeros((n,), C.dtype)
    g = jnp.zeros((m,), C.dtype)

    def body(carry, eps):
        f, g = carry
        g = -eps * jax.nn.logsumexp((f[:, None] - C) / eps + log_a, axis=0)
        f = -eps * jax.nn.logsumexp((g[None, :] - C) / eps + log_b, axis=1)
        return (f, g), None

    (f, g), _ = lax.scan(body, (f, g), eps_seq)
    return jnp.mean(f) + jnp.mean(g)


def _ot_symmetric(C: jax.Array, eps_seq: jax.Array) -> jax.Array:
    """Symmetric fixed point for the debiasing terms OT_ε(a,a)."""
    n = C.shape[0]
    log_a = -jnp.log(n)
    f = jnp.zeros((n,), C.dtype)

    def body(f, eps):
        ft = -eps * jax.nn.logsumexp((f[None, :] - C) / eps + log_a, axis=1)
        return 0.5 * (f + ft), None

    f, _ = lax.scan(body, f, eps_seq)
    return 2.0 * jnp.mean(f)


def sinkhorn_divergence(x: jax.Array, y: jax.Array, *, blur: float = 0.05,
                        n_iters: int = 30, n_final: int = 10) -> jax.Array:
    """Debiased Sinkhorn divergence between point clouds x [N,D], y [M,D].

    ``n_iters`` is the number of ε-scaling levels (geomloss 'scaling' analog);
    ``n_final`` extra iterations run at the target ε. When the clouds have
    equal size, the two debiasing problems run as one batched scan.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    eps = blur ** 2
    c_xy = _cost(x, y)
    c_xx = _cost(x, x)
    c_yy = _cost(y, y)
    diameter = jnp.max(c_xy)
    sched = _eps_schedule(diameter, eps, n_iters, n_final)
    ot_xy = _ot_dual(c_xy, sched)
    if c_xx.shape == c_yy.shape:
        ot_xx, ot_yy = jax.vmap(_ot_symmetric, in_axes=(0, None))(
            jnp.stack([c_xx, c_yy]), sched)
    else:
        ot_xx = _ot_symmetric(c_xx, sched)
        ot_yy = _ot_symmetric(c_yy, sched)
    return ot_xy - 0.5 * (ot_xx + ot_yy)


def batched_sinkhorn_divergence(x: jax.Array, y: jax.Array, *, blur: float = 0.05,
                                n_iters: int = 30) -> jax.Array:
    """vmap over the batch: the reference's per-sample python loop
    (reference model/loss.py:219-222) becomes one batched kernel. Returns [B]."""
    fn = lambda a, b: sinkhorn_divergence(a, b, blur=blur, n_iters=n_iters)
    return jax.vmap(fn)(x, y)
