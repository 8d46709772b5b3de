"""Token-masking utilities for masked-generation distillation.

Pure-function counterparts of the reference's ``random_masking``
(reference model/misc.py:5-32, MAE-style argsort-of-noise shuffling) and
``saliency_masking`` (reference model/misc.py:38-165, three attention-guided
variants that keep the *lowest*-attention tokens). Randomness comes from
explicit PRNG keys; all shapes are static so everything jits cleanly.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from deltakd_tpu.kd import aux as aux_ops


def random_masking(key: jax.Array, x: jax.Array, mask_ratio: float
                   ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-sample random token masking via argsort of uniform noise.

    Returns (x_keep [B,len_keep,D], mask [B,L] with 1 = removed, ids_restore,
    ids_masked) — the exact contract of reference model/misc.py:5-32.
    """
    B, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(key, (B, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    ids_masked = ids_shuffle[:, len_keep:]
    x_keep = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
    mask = jnp.ones((B, L), x.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_keep, mask, ids_restore, ids_masked


def _keep_lowest(scores: jax.Array, student_feat: jax.Array, len_keep: int
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Keep the len_keep lowest-scoring tokens (ascending argsort — the
    reference deliberately keeps the *least* salient tokens,
    reference model/misc.py:72-75)."""
    B, L = scores.shape
    D = student_feat.shape[-1]
    ids_shuffle = jnp.argsort(scores, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_keep = jnp.take_along_axis(student_feat, ids_keep[..., None], axis=1)
    mask = jnp.ones((B, L), student_feat.dtype).at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_keep, mask, ids_restore


def saliency_masking(aux_params: Dict[str, Any], teacher_feat: jax.Array,
                     student_feat: jax.Array, mask_ratio: float, method: int,
                     teacher_prefix: int = 2
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Attention-guided masking (reference model/misc.py:38-165).

    ``teacher_feat`` includes its prefix tokens ([CLS],[DIST] for a distilled
    teacher); ``student_feat`` is patch tokens only ([B, L_patch, D]).
    """
    attn = aux_params["saliency_attn"]
    if method == 1:
        # Self-attention diagonal over patch tokens (prefix removed).
        patches = teacher_feat[:, teacher_prefix:]
        L = patches.shape[1]
        len_keep = int(L * (1 - mask_ratio))
        scores = aux_ops.simple_attention_scores(attn, patches)  # [B, L]
        return _keep_lowest(scores, student_feat, len_keep)
    if method == 2:
        # CLS kept, DIST dropped; CLS-row attention over remaining tokens.
        kept = jnp.concatenate(
            [teacher_feat[:, :1], teacher_feat[:, teacher_prefix:]], axis=1)
        L_patch = kept.shape[1] - 1
        len_keep = int(L_patch * (1 - mask_ratio))
        scores = aux_ops.simple_attention_cls_row(attn, kept)[:, 1:]  # drop CLS column
        return _keep_lowest(scores, student_feat, len_keep)
    if method == 3:
        # Cross-attention: CLS query over patch keys.
        kept = jnp.concatenate(
            [teacher_feat[:, :1], teacher_feat[:, teacher_prefix:]], axis=1)
        cls_tok, patches = kept[:, :1], kept[:, 1:]
        L_patch = patches.shape[1]
        len_keep = int(L_patch * (1 - mask_ratio))
        scores = aux_ops.cross_attention_scores(attn, cls_tok, patches)[:, 0]
        return _keep_lowest(scores, student_feat, len_keep)
    raise ValueError(f"Invalid saliency masking method: {method}")


def fill_and_restore(x_keep: jax.Array, ids_restore: jax.Array,
                     mask_token: jax.Array) -> jax.Array:
    """Append mask tokens for removed positions and unshuffle back to the
    original token order (reference model/loss.py:300-302 et al.)."""
    B, L = ids_restore.shape
    D = x_keep.shape[-1]
    n_masked = L - x_keep.shape[1]
    mask_tokens = jnp.tile(mask_token.astype(x_keep.dtype), (B, n_masked, 1))
    x_full = jnp.concatenate([x_keep, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, ids_restore[..., None], axis=1)


def tokens_to_grid(x: jax.Array) -> jax.Array:
    """[B, N, D] → [B, hw, hw, D] with hw = int(sqrt(N)) (reference
    loss.py:305-306 — NHWC here; the reference permutes to NCHW for torch)."""
    B, N, D = x.shape
    hw = int(math.isqrt(N))
    return x.reshape(B, hw, hw, D)


def grid_to_tokens(x: jax.Array) -> jax.Array:
    B, H, W, D = x.shape
    return x.reshape(B, H * W, D)
