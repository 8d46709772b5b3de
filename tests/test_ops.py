"""Pallas op kernels vs references (TPU-gated; sort network also runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltakd_tpu.ops.fused_mlp import _HAS_PLTPU, reference_mlp
from deltakd_tpu.ops.sort import bitonic_sort

tpu_only = pytest.mark.skipif(
    not (_HAS_PLTPU and jax.default_backend() == "tpu"),
    reason="Pallas TPU backend unavailable (CPU test run)")


def _mlp_inputs(seed=0, M=1000, D=48, H=192):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(M, D).astype(np.float32)),
            jnp.asarray(rng.randn(D, H).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(H).astype(np.float32) * 0.01),
            jnp.asarray(rng.randn(H, D).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(D).astype(np.float32) * 0.01))


@tpu_only
def test_fused_mlp_forward():
    from deltakd_tpu.ops.fused_mlp import fused_mlp

    args = _mlp_inputs()
    np.testing.assert_allclose(np.asarray(fused_mlp(*args)),
                               np.asarray(reference_mlp(*args)), atol=1e-3)


@tpu_only
def test_fused_mlp_train_gradients():
    from deltakd_tpu.ops.fused_mlp import fused_mlp_train

    args = _mlp_inputs(1)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) ** 2)

    g_ref = jax.grad(loss(reference_mlp), argnums=(0, 1, 2, 3, 4))(*args)
    g_fus = jax.grad(loss(fused_mlp_train), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_ref, g_fus):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-3 * scale)


@tpu_only
def test_pallas_bitonic_sort():
    from deltakd_tpu.ops.sort import bitonic_sort_pallas

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(4, 196, 128).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(bitonic_sort_pallas(x, axis=1)),
        np.sort(np.asarray(x), axis=1))


def test_xla_bitonic_sort_cpu():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 100, 5).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(bitonic_sort(x, axis=1)),
                                  np.sort(np.asarray(x), axis=1))


def test_sorted_l1_matches_reference_formula_cpu():
    """sorted_l1 (chunked) equals the unchunked sort-then-L1 formula in both
    value and gradient, and carries no gradient into the teacher side."""
    from deltakd_tpu.ops.sort import sorted_l1

    rng = np.random.RandomState(11)
    B = 40  # not a multiple of the 32-row chunk -> exercises the tail chunk
    s = jnp.asarray(rng.randn(B, 20, 8).astype(np.float32))
    t = jnp.asarray(rng.randn(B, 20, 8).astype(np.float32))

    def ref_loss(x, tt):
        return jnp.mean(jnp.abs(bitonic_sort(x, axis=1)
                                - bitonic_sort(tt, axis=1)))

    np.testing.assert_allclose(float(sorted_l1(s, t, axis=1)),
                               float(ref_loss(s, t)), rtol=1e-6)
    g = jax.grad(lambda x: sorted_l1(x, t, axis=1))(s)
    g_ref = jax.grad(lambda x: ref_loss(x, t))(s)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-8)
    gt = jax.grad(lambda tt: sorted_l1(s, tt, axis=1))(t)
    assert float(jnp.max(jnp.abs(gt))) == 0.0


def test_sorted_l1_pallas_matches_network_cpu():
    """The fused-kernel sorted_l1 (opt-in; measured slower on v5e — see the
    negative-results table in ops/sort.py) stays value- and grad-correct:
    interpret mode runs the exact kernel code path on CPU."""
    from deltakd_tpu.ops import fused_block
    from deltakd_tpu.ops.sort import _sorted_l1_network, sorted_l1_pallas

    rng = np.random.RandomState(7)
    s = jnp.asarray(rng.randn(4, 10, 128).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 10, 128).astype(np.float32))

    fused_block.set_interpret(True)
    try:
        v_pl, g_pl = jax.value_and_grad(
            lambda x: sorted_l1_pallas(x, t, axis=1))(s)
    finally:
        fused_block.set_interpret(False)
    v_net, g_net = jax.value_and_grad(
        lambda x: _sorted_l1_network(x, t, axis=1))(s)
    # value: same per-element |diff| terms, different summation order
    np.testing.assert_allclose(float(v_pl), float(v_net), rtol=1e-5)
    # distinct values (continuous fp32) -> tie routing can't differ
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_net),
                               rtol=1e-5, atol=1e-8)
