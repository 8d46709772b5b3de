"""Mixup / CutMix as a pure on-device batch transform.

Matches timm's ``Mixup`` in 'batch' mode as the reference configures it
(reference tools/train.py:288-295): with probability ``prob`` the batch is
mixed; when both mixup and cutmix are enabled a coin with ``switch_prob``
picks cutmix; one λ ~ Beta(α, α) per batch; partners are the flipped batch;
labels become smoothed one-hot mixed with the same λ (cutmix corrects λ by the
actual clipped box area).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.1
    num_classes: int = 1000
    mode: str = "batch"  # 'batch' | 'pair' | 'elem' (timm Mixup modes)

    @classmethod
    def from_config(cls, cfg, num_classes: int) -> Optional["MixupConfig"]:
        if not cfg.mixup_active:
            return None
        return cls(mixup_alpha=cfg.mixup, cutmix_alpha=cfg.cutmix,
                   prob=cfg.mixup_prob, switch_prob=cfg.mixup_switch_prob,
                   label_smoothing=cfg.smoothing, num_classes=num_classes,
                   mode=cfg.mixup_mode)


def one_hot_smoothed(labels: jax.Array, num_classes: int, smoothing: float
                     ) -> jax.Array:
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(key: jax.Array, h: int, w: int, lam: jax.Array
               ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """timm rand_bbox: box of area ratio (1-λ), centered uniformly, clipped.
    Returns (y0, y1, x0, x1, corrected λ)."""
    k_y, k_x = jax.random.split(key)
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = jnp.floor(h * ratio)
    cut_w = jnp.floor(w * ratio)
    cy = jax.random.randint(k_y, (), 0, h).astype(jnp.float32)
    cx = jax.random.randint(k_x, (), 0, w).astype(jnp.float32)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    lam_corrected = 1.0 - (y1 - y0) * (x1 - x0) / float(h * w)
    return y0, y1, x0, x1, lam_corrected


def apply_mixup(key: jax.Array, images: jax.Array, labels: jax.Array,
                mc: MixupConfig) -> Tuple[jax.Array, jax.Array]:
    """[B,H,W,C] images + int labels → (mixed images, soft targets [B,C]).

    'batch' draws one (λ, mixup-vs-cutmix, apply) decision for the whole batch
    (the reference recipes' mode); 'elem' draws all of them per sample; 'pair'
    is per sample with decisions mirrored between flip partners (i, B-1-i),
    matching timm's Mixup modes.
    """
    B, H, W, _ = images.shape
    per_elem = mc.mode in ("elem", "pair")
    shape = (B,) if per_elem else ()
    k_do, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(key, 5)

    do_mix = jax.random.bernoulli(k_do, mc.prob, shape)
    if mc.cutmix_alpha > 0 and mc.mixup_alpha > 0:
        use_cutmix = jax.random.bernoulli(k_switch, mc.switch_prob, shape)
    else:
        use_cutmix = jnp.full(shape, mc.mixup_alpha <= 0)
    lam_mix = (jax.random.beta(k_lam_m, mc.mixup_alpha, mc.mixup_alpha, shape)
               if mc.mixup_alpha > 0 else jnp.full(shape, 1.0))
    lam_cut = (jax.random.beta(k_lam_c, mc.cutmix_alpha, mc.cutmix_alpha, shape)
               if mc.cutmix_alpha > 0 else jnp.full(shape, 1.0))

    if mc.mode == "pair":
        # mirror decisions between flip partners so each pair mixes symmetrically
        def mirror(v):
            return jnp.where(jnp.arange(B) < B // 2, v, v[::-1])

        do_mix, use_cutmix = mirror(do_mix), mirror(use_cutmix)
        lam_mix, lam_cut = mirror(lam_mix), mirror(lam_cut)

    flipped = images[::-1]
    lam_b = lam_mix.reshape(shape + (1, 1, 1)) if per_elem else lam_mix
    lam_b = jnp.asarray(lam_b).astype(images.dtype)  # keep bf16 pixel stage bf16
    mixed_m = lam_b * images + (1.0 - lam_b) * flipped

    if per_elem:
        y0, y1, x0, x1, lam_cut_c = jax.vmap(
            lambda k, l: _rand_bbox(k, H, W, l)
        )(jax.random.split(k_box, B), lam_cut)
        if mc.mode == "pair":
            y0, y1, x0, x1, lam_cut_c = (jnp.where(jnp.arange(B) < B // 2, v, v[::-1])
                                         for v in (y0, y1, x0, x1, lam_cut_c))
        yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        box = ((yy >= y0[:, None, None]) & (yy < y1[:, None, None])
               & (xx >= x0[:, None, None]) & (xx < x1[:, None, None]))[..., None]
    else:
        y0, y1, x0, x1, lam_cut_c = _rand_bbox(k_box, H, W, lam_cut)
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        box = ((yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1))[None, :, :, None]
    mixed_c = jnp.where(box, flipped, images)

    sel = use_cutmix.reshape(shape + (1, 1, 1)) if per_elem else use_cutmix
    mixed = jnp.where(sel, mixed_c, mixed_m)
    lam = jnp.where(use_cutmix, lam_cut_c, lam_mix)

    do_b = do_mix.reshape(shape + (1, 1, 1)) if per_elem else do_mix
    images_out = jnp.where(do_b, mixed, images)
    lam = jnp.where(do_mix, lam, 1.0)

    targets = one_hot_smoothed(labels, mc.num_classes, mc.label_smoothing)
    lam_t = lam[:, None] if per_elem else lam
    targets = lam_t * targets + (1.0 - lam_t) * targets[::-1]
    return images_out, targets
