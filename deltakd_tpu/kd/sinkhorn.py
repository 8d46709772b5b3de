"""Log-domain Sinkhorn divergence with ε-scaling, XLA-native.

The reference's WassKD 'sinkhorn' mode calls ``geomloss.SamplesLoss("sinkhorn",
blur=0.05)`` per sample over token point clouds (reference model/loss.py:200-223)
— a CUDA/KeOps dependency that is not even installable from the reference's own
requirements (SURVEY.md bug B3). Here the debiased entropic-OT divergence is
computed in two stages:

1. **Potential solve** (non-differentiable fixed point): log-domain Sinkhorn
   with geometric ε-scaling as a fixed-length ``lax.scan``, vmapped over the
   batch — dense MXU matmuls + logsumexps, no dynamic control flow.
2. **Differentiable finalize**: one extra Sinkhorn half-iteration through a
   freshly-built (differentiable) cost matrix with the solved potentials
   held fixed — the envelope (Danskin) gradient geomloss also uses.
   Autodiffing the 26-level solve itself would be ~10x costlier in the
   backward pass and no more correct at the fixed point.

A Pallas solver keeping each [196,196] problem in VMEM across all ε-levels
was built and benchmarked in round 2: it compiled (after raising the scoped
VMEM cap) but ran ~30x *slower* than this scan — the per-program serial
level loop leaves the VPU idle and Mosaic lays the lane-dim logsumexps out
poorly. The scan amortizes across the batch dimension instead; measurement
beats theory, so the scan stays.

Conventions follow geomloss: for p=2 the ground cost is C(x,y) = |x-y|²/2, the
temperature is ε = blur^p, and the returned value is the debiased divergence
S_ε(a,b) = OT_ε(a,b) − ½OT_ε(a,a) − ½OT_ε(b,b) with uniform weights (≥ 0,
vanishing at a = b). Convergence at small ε uses ε-scaling: the temperature
anneals geometrically from the cost diameter down to ε; only the level count
is static, so one compilation serves all inputs. Defaults (20 annealing
levels + 6 refinements) sit at ≤0.6% relative error vs exact OT on the
validation workloads (tests/test_losses.py pins 2%); geomloss's own
scaling=0.5 uses a comparable count for these diameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_N_ITERS = 20
DEFAULT_N_FINAL = 6


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


def _solve_scan(x, y, eps: float, n_iters: int, n_final: int):
    """Fixed-point potentials for one problem: (f_xy, g_xy, f_xx, f_yy)."""
    c_xy = _cost(x, y)
    c_xx = _cost(x, x)
    c_yy = _cost(y, y)
    n, m = c_xy.shape
    log_a = -jnp.log(n)
    log_b = -jnp.log(m)
    sched = _eps_schedule(jnp.max(c_xy), eps, n_iters, n_final)

    def body(carry, e):
        f, g = carry
        g = -e * jax.nn.logsumexp((f[:, None] - c_xy) / e + log_a, axis=0)
        f = -e * jax.nn.logsumexp((g[None, :] - c_xy) / e + log_b, axis=1)
        return (f, g), None

    (f_xy, g_xy), _ = lax.scan(body, (jnp.zeros((n,)), jnp.zeros((m,))), sched)

    def sym_body(carry, e):
        fx, fy = carry
        fxt = -e * jax.nn.logsumexp((fx[None, :] - c_xx) / e + log_a, axis=1)
        fyt = -e * jax.nn.logsumexp((fy[None, :] - c_yy) / e + log_b, axis=1)
        return (0.5 * (fx + fxt), 0.5 * (fy + fyt)), None

    (f_xx, f_yy), _ = lax.scan(sym_body, (jnp.zeros((n,)), jnp.zeros((m,))),
                               sched)
    return f_xy, g_xy, f_xx, f_yy


def _finalize(x, y, pots, eps: float) -> jax.Array:
    """Debiased divergence from fixed potentials, differentiable in x, y."""
    f_xy, g_xy, f_xx, f_yy = (lax.stop_gradient(p) for p in pots)
    n, m = x.shape[0], y.shape[0]
    log_a, log_b = -jnp.log(n), -jnp.log(m)
    c_xy = _cost(x, y)
    g_fin = -eps * jax.nn.logsumexp((f_xy[:, None] - c_xy) / eps + log_a, axis=0)
    f_fin = -eps * jax.nn.logsumexp((g_xy[None, :] - c_xy) / eps + log_b, axis=1)
    ot_xy = jnp.mean(f_fin) + jnp.mean(g_fin)
    c_xx = _cost(x, x)
    c_yy = _cost(y, y)
    ot_xx = 2.0 * jnp.mean(
        -eps * jax.nn.logsumexp((f_xx[None, :] - c_xx) / eps + log_a, axis=1))
    ot_yy = 2.0 * jnp.mean(
        -eps * jax.nn.logsumexp((f_yy[None, :] - c_yy) / eps + log_b, axis=1))
    return ot_xy - 0.5 * (ot_xx + ot_yy)


def sinkhorn_divergence(x: jax.Array, y: jax.Array, *, blur: float = 0.05,
                        n_iters: int = DEFAULT_N_ITERS,
                        n_final: int = DEFAULT_N_FINAL) -> jax.Array:
    """Debiased Sinkhorn divergence between point clouds x [N,D], y [M,D].

    ``n_iters`` is the number of ε-scaling levels (geomloss 'scaling' analog);
    ``n_final`` extra iterations run at the target ε.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    eps = blur ** 2
    xs, ys = lax.stop_gradient(x), lax.stop_gradient(y)
    pots = _solve_scan(xs, ys, eps, n_iters, n_final)
    return _finalize(x, y, pots, eps)


def batched_sinkhorn_divergence(x: jax.Array, y: jax.Array, *, blur: float = 0.05,
                                n_iters: int = DEFAULT_N_ITERS,
                                n_final: int = DEFAULT_N_FINAL) -> jax.Array:
    """The reference's per-sample python loop (reference model/loss.py:219-222)
    as one batched solve; x, y [B, N, D] → [B]."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    eps = blur ** 2
    xs, ys = lax.stop_gradient(x), lax.stop_gradient(y)
    pots = jax.vmap(
        lambda a, b: _solve_scan(a, b, eps, n_iters, n_final))(xs, ys)
    return jax.vmap(lambda a, b, *p: _finalize(a, b, p, eps))(x, y, *pots)
