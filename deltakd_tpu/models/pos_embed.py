"""Position-embedding grid interpolation.

Reimplements the reference finetune-time bicubic interpolation of the patch
position embeddings (reference tools/utils.py:112-160): the prefix (CLS/DIST)
token embeddings pass through untouched, the patch part is reshaped onto its
square grid, resized bicubically to the new grid, and re-flattened. Used both
when importing pretrained weights at a different resolution and by
``--finetune`` transfer learning.

Numerics note: ``jax.image.resize(method='bicubic')`` uses the Keys kernel
with a=-0.5 plus antialiasing, while ``torch.nn.functional.interpolate``
(what the reference calls) uses a=-0.75 without antialiasing — different
results. To keep checkpoint-transfer parity we build the torch-convention
cubic-convolution weights explicitly as small static matrices (separable
1-D interpolation), which also compiles to two tiny matmuls.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_A = -0.75  # torch bicubic kernel parameter


def _cubic_kernel(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    w = np.where(
        t <= 1.0,
        ((_A + 2.0) * t - (_A + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, _A * (((t - 5.0) * t + 8.0) * t - 4.0), 0.0))
    return w


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] weights for 1-D torch-style bicubic (align_corners=False,
    edge-replicated borders)."""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    mat = np.zeros((out_size, in_size), np.float64)
    for off in range(-1, 3):
        idx = np.clip(i0 + off, 0, in_size - 1)
        w = _cubic_kernel(src - (i0 + off))
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def resize_grid_bicubic(grid: jax.Array, new_size: int) -> jax.Array:
    """[1, H, H, D] → [1, new, new, D], matching torch F.interpolate(bicubic)."""
    old_size = grid.shape[1]
    if old_size == new_size:
        return grid
    m = jnp.asarray(_resize_matrix(old_size, new_size))
    g = grid.astype(jnp.float32)
    g = jnp.einsum("oh,bhwd->bowd", m, g)
    g = jnp.einsum("ow,bhwd->bhod", m, g)
    return g


def interpolate_pos_embed(pos_embed: jax.Array, num_prefix_tokens: int,
                          new_num_patches: int) -> jax.Array:
    """Resize [1, prefix+P_old, D] → [1, prefix+P_new, D] (bicubic on the grid).

    Mirrors the three checkpoint layouts the reference handles
    (reference tools/utils.py:129-144): callers should slice/augment the prefix
    before calling when the source has a different number of prefix tokens.
    """
    total = pos_embed.shape[1]
    extra = pos_embed[:, :num_prefix_tokens]
    patch = pos_embed[:, num_prefix_tokens:]
    old_num_patches = total - num_prefix_tokens
    if old_num_patches == new_num_patches:
        return pos_embed

    old_size = int(round(old_num_patches ** 0.5))
    new_size = int(round(new_num_patches ** 0.5))
    if old_size * old_size != old_num_patches:
        raise ValueError(f"non-square patch grid: {old_num_patches} patches")
    dim = pos_embed.shape[-1]
    grid = patch.reshape(1, old_size, old_size, dim)
    grid = resize_grid_bicubic(grid, new_size)
    return jnp.concatenate(
        [extra.astype(jnp.float32), grid.reshape(1, new_size * new_size, dim)],
        axis=1)
