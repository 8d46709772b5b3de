"""random_masking / saliency_masking parity with the reference's torch
implementations given identical noise (reference model/misc.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from deltakd_tpu.kd.masking import fill_and_restore, random_masking

from tests.torch_ref import torch_random_masking


def test_random_masking_matches_torch_with_same_noise():
    B, L, D = 3, 16, 8
    rng = np.random.RandomState(0)
    x = rng.randn(B, L, D).astype(np.float32)
    key = jax.random.PRNGKey(5)

    x_keep, mask, ids_restore, ids_masked = random_masking(key, jnp.asarray(x), 0.5)

    noise = np.asarray(jax.random.uniform(key, (B, L)))
    tx_keep, tmask, tids_restore, tids_masked = torch_random_masking(
        torch.from_numpy(x), 0.5, torch.from_numpy(noise))

    np.testing.assert_array_equal(np.asarray(x_keep), tx_keep.numpy())
    np.testing.assert_array_equal(np.asarray(mask), tmask.numpy())
    np.testing.assert_array_equal(np.asarray(ids_restore), tids_restore.numpy())
    np.testing.assert_array_equal(np.asarray(ids_masked), tids_masked.numpy())


def test_random_masking_mask_semantics():
    """mask: 1 = removed; kept count = int(L*(1-ratio)); restore is an inverse
    permutation."""
    B, L, D = 2, 16, 4
    x = jnp.arange(B * L * D, dtype=jnp.float32).reshape(B, L, D)
    x_keep, mask, ids_restore, ids_masked = random_masking(jax.random.PRNGKey(1), x, 0.25)
    assert x_keep.shape == (B, 12, D)
    assert ids_masked.shape == (B, 4)
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), np.full(B, 4.0))


def test_fill_and_restore_inverts_shuffle():
    """Unmasked positions must recover their original values; masked positions
    must equal the mask token."""
    B, L, D = 2, 16, 4
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, L, D).astype(np.float32))
    mask_token = jnp.full((1, 1, D), 7.5)
    x_keep, mask, ids_restore, _ = random_masking(jax.random.PRNGKey(3), x, 0.5)
    restored = fill_and_restore(x_keep, ids_restore, mask_token)
    kept = np.asarray(mask) == 0
    np.testing.assert_array_equal(np.asarray(restored)[kept], np.asarray(x)[kept])
    np.testing.assert_array_equal(
        np.asarray(restored)[~kept],
        np.broadcast_to(np.asarray(mask_token)[0, 0], np.asarray(x)[~kept].shape))
