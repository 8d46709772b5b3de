"""Pallas fused attention vs the einsum reference (runs on TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltakd_tpu.ops.attention import (flash_attention, reference_attention,
                                       use_flash_attention)

pytestmark = pytest.mark.skipif(
    not use_flash_attention(),
    reason="Pallas TPU backend unavailable (CPU test run)")


def _qkv(seed, B=4, H=3, N=197, D=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, H, N, D), dtype) for k in ks)


def test_forward_matches_reference():
    q, k, v = _qkv(0)
    np.testing.assert_allclose(np.asarray(flash_attention(q, k, v)),
                               np.asarray(reference_attention(q, k, v)),
                               atol=2e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(1)

    def loss(attn):
        return lambda q, k, v: jnp.sum(attn(q, k, v) ** 2)

    g_ref = jax.grad(loss(reference_attention), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        scale = float(jnp.abs(a).max())
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-3 * max(scale, 1.0))


def test_bf16_inputs():
    q, k, v = _qkv(2, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = reference_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
