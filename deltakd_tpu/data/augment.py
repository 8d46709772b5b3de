"""On-device data augmentation (jitted, batched, VPU-friendly).

The reference does all augmentation on the host with PIL/torchvision inside
DataLoader workers (reference dataset/datasets.py:53-84, tools/augment.py) —
on TPU that host work becomes the bottleneck (SURVEY.md hard part #6). Here
the host ships raw uint8 batches and the *entire* train transform runs inside
the jitted step: RandomResizedCrop + horizontal flip as a single batched
affine warp, the full 15-op RandAugment policy (``rand-m9-mstd0.5-inc1``
semantics, timm's increasing-severity op set), DeiT-III 3-Augment, color
jitter, normalization and random erasing. Everything is static-shaped and
keyed by explicit PRNG.

Op semantics follow PIL/timm (posterize bit masks, solarize thresholds,
PIL-style equalize LUT, blend-based color/contrast/brightness/sharpness).
Geometric resampling is bilinear (PIL uses per-op defaults; the difference is
sub-quantization-level for training purposes and documented here).

Images flow as float32 in [0, 255] until the final normalize.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# -----------------------------------------------------------------------------
# Affine warps
# -----------------------------------------------------------------------------


def _affine_grid(matrix: jax.Array, out_h: int, out_w: int) -> Tuple[jax.Array, jax.Array]:
    """Map output pixel centers through a 2x3 matrix → source (y, x) coords."""
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    sy = matrix[0, 0] * yy + matrix[0, 1] * xx + matrix[0, 2]
    sx = matrix[1, 0] * yy + matrix[1, 1] * xx + matrix[1, 2]
    return sy, sx


def warp_bilinear(img: jax.Array, matrix: jax.Array, out_h: int, out_w: int,
                  fill: Optional[jax.Array] = None) -> jax.Array:
    """Sample one [H, W, C] image through an affine map, bilinear with
    out-of-bounds fill. Compiles to four gathers + blends."""
    H, W, C = img.shape
    sy, sx = _affine_grid(matrix, out_h, out_w)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return img[yc, xc]  # [out_h, out_w, C]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wy = wy[..., None]
    wx = wx[..., None]
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    if fill is not None:
        oob = ((sy < -0.5) | (sy > H - 0.5) | (sx < -0.5) | (sx > W - 0.5))
        out = jnp.where(oob[..., None], fill, out)
    return out


def _compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose two 2x3 affine maps: result(x) = a(b(x))... in source-lookup
    convention result = b ∘ a (apply a's lookup, then b's)."""
    a3 = jnp.concatenate([a, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    b3 = jnp.concatenate([b, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return (b3 @ a3)[:2]


def crop_matrix(top: jax.Array, left: jax.Array, crop_h: jax.Array,
                crop_w: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Output pixel → source pixel map for crop-and-resize."""
    sy = crop_h / out_h
    sx = crop_w / out_w
    return jnp.stack([
        jnp.stack([sy, jnp.zeros(()), top + 0.5 * sy - 0.5]),
        jnp.stack([jnp.zeros(()), sx, left + 0.5 * sx - 0.5]),
    ])


def hflip_matrix(out_w: int) -> jax.Array:
    return jnp.array([[1.0, 0.0, 0.0], [0.0, -1.0, float(out_w - 1)]])


# -----------------------------------------------------------------------------
# RandomResizedCrop (+flip), the primary DeiT transform
# -----------------------------------------------------------------------------


def random_resized_crop_params(key: jax.Array, h: int, w: int,
                               scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3)):
    """torchvision RandomResizedCrop sampling (10 tries collapsed into a
    vectorized accept-first; falls back to center crop like torchvision)."""
    k_area, k_ratio, k_top, k_left, k_pick = jax.random.split(key, 5)
    n_try = 10
    area = h * w
    target_area = area * jax.random.uniform(k_area, (n_try,), minval=scale[0],
                                            maxval=scale[1])
    log_ratio = jax.random.uniform(k_ratio, (n_try,),
                                   minval=math.log(ratio[0]),
                                   maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    cw = jnp.round(jnp.sqrt(target_area * aspect))
    ch = jnp.round(jnp.sqrt(target_area / aspect))
    ok = (cw <= w) & (ch <= h)
    u_top = jax.random.uniform(k_top, (n_try,))
    u_left = jax.random.uniform(k_left, (n_try,))
    top = jnp.floor(u_top * (h - ch + 1))
    left = jnp.floor(u_left * (w - cw + 1))

    idx = jnp.argmax(ok)  # first success
    any_ok = jnp.any(ok)

    # fallback: center crop at clamped aspect (torchvision semantics)
    in_ratio = w / h
    fb_w = jnp.where(in_ratio < ratio[0], w, jnp.where(in_ratio > ratio[1],
                                                       round(h * ratio[1]), w))
    fb_h = jnp.where(in_ratio < ratio[0], round(w / ratio[0]),
                     jnp.where(in_ratio > ratio[1], h, h))
    fb_top = (h - fb_h) // 2
    fb_left = (w - fb_w) // 2

    ch_f = jnp.where(any_ok, ch[idx], fb_h).astype(jnp.float32)
    cw_f = jnp.where(any_ok, cw[idx], fb_w).astype(jnp.float32)
    top_f = jnp.where(any_ok, top[idx], fb_top).astype(jnp.float32)
    left_f = jnp.where(any_ok, left[idx], fb_left).astype(jnp.float32)
    return top_f, left_f, ch_f, cw_f


# -----------------------------------------------------------------------------
# Pixel ops (PIL semantics on float [0,255])
# -----------------------------------------------------------------------------

_GRAY = jnp.array([0.299, 0.587, 0.114])


def _clip(x):
    return jnp.clip(x, 0.0, 255.0)


def _blend(a, b, factor):
    return _clip(b + factor * (a - b))


def op_invert(img, _m, _key, _fill):
    return 255.0 - img


def op_solarize(img, m, _key, _fill):
    thresh = 256.0 - m / 10.0 * 256.0  # SolarizeIncreasing
    return jnp.where(img < thresh, img, 255.0 - img)


def op_solarize_add(img, m, _key, _fill):
    add = m / 10.0 * 110.0
    return jnp.where(img < 128.0, _clip(img + add), img)


def op_posterize(img, m, _key, _fill):
    bits = jnp.maximum(4 - jnp.floor(m / 10.0 * 4.0), 1.0)  # PosterizeIncreasing
    shift = (8.0 - bits)
    q = jnp.exp2(shift)
    return jnp.floor(jnp.floor(img) / q) * q


def op_autocontrast(img, _m, _key, _fill):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
    out = (img - lo) * scale
    return jnp.where(hi > lo, _clip(out), img)


def op_equalize(img, _m, _key, _fill):
    """PIL ImageOps.equalize: per-channel LUT from the cumulative histogram."""
    v = jnp.clip(jnp.floor(img), 0, 255).astype(jnp.int32)  # [H,W,C]
    npix = img.shape[0] * img.shape[1]
    one_hot = jax.nn.one_hot(v.reshape(-1, img.shape[2]), 256, dtype=jnp.float32)
    hist = jnp.sum(one_hot, axis=0)  # [C, 256]
    last_nonzero = jnp.take_along_axis(
        hist, (255 - jnp.argmax(hist[:, ::-1] > 0, axis=1))[:, None], axis=1)[:, 0]
    step = jnp.floor((npix - last_nonzero) / 255.0)
    cum_before = jnp.cumsum(hist, axis=1) - hist
    lut = jnp.floor((step[:, None] / 2.0 + cum_before) / jnp.maximum(step[:, None], 1.0))
    lut = jnp.clip(lut, 0, 255)
    mapped = jnp.stack([lut[c][v[..., c]] for c in range(img.shape[2])], axis=-1)
    return jnp.where(step[None, None, :] > 0, mapped, img)


def op_color(img, m, key, _fill):
    factor = _enhance_factor(m, key)
    gray = jnp.sum(img * _GRAY, axis=-1, keepdims=True)
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def op_contrast(img, m, key, _fill):
    factor = _enhance_factor(m, key)
    # PIL: blend with the mean of the L-converted image (rounded)
    gray = jnp.sum(img * _GRAY, axis=-1)
    mean = jnp.round(jnp.mean(jnp.floor(gray)))
    return _blend(img, jnp.full_like(img, mean), factor)


def op_brightness(img, m, key, _fill):
    factor = _enhance_factor(m, key)
    return _blend(img, jnp.zeros_like(img), factor)


def op_sharpness(img, m, key, _fill):
    factor = _enhance_factor(m, key)
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], kernel[None, None],
        window_strides=(1, 1), padding="SAME")[:, 0].transpose(1, 2, 0)
    # PIL keeps the 1-pixel border unsmoothed
    H, W, _ = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    border = (yy == 0) | (yy == H - 1) | (xx == 0) | (xx == W - 1)
    smoothed = jnp.where(border[..., None], img, smoothed)
    return _blend(img, smoothed, factor)


def _enhance_factor(m, key):
    """timm 'increasing' enhance arg: 1 + 0.9·(m/10) with random sign."""
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    return 1.0 + sign * (m / 10.0) * 0.9


def _geom(img, matrix, fill):
    h, w, _ = img.shape
    return warp_bilinear(img, matrix, h, w, fill=fill)


def op_rotate(img, m, key, fill):
    k_sign = key
    sign = jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
    deg = sign * m / 10.0 * 30.0
    rad = deg * math.pi / 180.0
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    # rotate about center (source-lookup matrix)
    mat = jnp.stack([
        jnp.stack([c, -s, cy - c * cy + s * cx]),
        jnp.stack([s, c, cx - s * cy - c * cx]),
    ])
    return _geom(img, mat, fill)


def _shear_mat(sh_y, sh_x, h, w):
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    return jnp.stack([
        jnp.stack([jnp.ones(()), sh_y, -sh_y * cx]),
        jnp.stack([sh_x, jnp.ones(()), -sh_x * cy]),
    ])


def op_shear_x(img, m, key, fill):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    sh = sign * m / 10.0 * 0.3
    h, w, _ = img.shape
    return _geom(img, _shear_mat(jnp.zeros(()) + sh, jnp.zeros(()), h, w), fill)


def op_shear_y(img, m, key, fill):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    sh = sign * m / 10.0 * 0.3
    h, w, _ = img.shape
    return _geom(img, _shear_mat(jnp.zeros(()), jnp.zeros(()) + sh, h, w), fill)


def op_translate_x(img, m, key, fill):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    h, w, _ = img.shape
    t = sign * m / 10.0 * 0.45 * w
    mat = jnp.stack([
        jnp.stack([jnp.ones(()), jnp.zeros(()), jnp.zeros(())]),
        jnp.stack([jnp.zeros(()), jnp.ones(()), t]),
    ])
    return _geom(img, mat, fill)


def op_translate_y(img, m, key, fill):
    sign = jnp.where(jax.random.bernoulli(key), 1.0, -1.0)
    h, w, _ = img.shape
    t = sign * m / 10.0 * 0.45 * h
    mat = jnp.stack([
        jnp.stack([jnp.ones(()), jnp.zeros(()), t]),
        jnp.stack([jnp.zeros(()), jnp.ones(()), jnp.zeros(())]),
    ])
    return _geom(img, mat, fill)


def op_identity(img, _m, _key, _fill):
    return img


# timm _RAND_INCREASING_TRANSFORMS order (minus Invert duplicates)
RAND_OPS = [
    op_autocontrast, op_equalize, op_invert, op_rotate, op_posterize,
    op_solarize, op_solarize_add, op_color, op_contrast, op_brightness,
    op_sharpness, op_shear_x, op_shear_y, op_translate_x, op_translate_y,
]


# -----------------------------------------------------------------------------
# Policies
# -----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class RandAugmentConfig:
    magnitude: float = 9.0
    mstd: float = 0.5
    num_layers: int = 2
    prob: float = 0.5

    @classmethod
    def parse(cls, spec: str) -> Optional["RandAugmentConfig"]:
        """Parse timm policy strings like 'rand-m9-mstd0.5-inc1'."""
        if not spec or not spec.startswith("rand"):
            return None
        kw = {}
        for tok in spec.split("-")[1:]:
            if tok.startswith("mstd"):
                kw["mstd"] = float(tok[4:])
            elif tok.startswith("m"):
                kw["magnitude"] = float(tok[1:])
            elif tok.startswith("n"):
                kw["num_layers"] = int(tok[1:])
            elif tok.startswith("p"):
                kw["prob"] = float(tok[1:])
            # inc1 selects the increasing-severity op set (our default)
        return cls(**kw)


def rand_augment(key: jax.Array, img: jax.Array, ra: RandAugmentConfig,
                 fill: jax.Array) -> jax.Array:
    """Apply ``num_layers`` randomly chosen ops to one image."""

    def layer(i, img):
        k = jax.random.fold_in(key, i)
        k_op, k_apply, k_mag, k_arg = jax.random.split(k, 4)
        op_idx = jax.random.randint(k_op, (), 0, len(RAND_OPS))
        m = jnp.clip(ra.magnitude + ra.mstd * jax.random.normal(k_mag), 0.0, 10.0)
        branches = [
            (lambda im, op=op: op(im, m, k_arg, fill)) for op in RAND_OPS
        ]
        out = jax.lax.switch(op_idx, branches, img)
        return jnp.where(jax.random.bernoulli(k_apply, ra.prob), out, img)

    for i in range(ra.num_layers):
        img = layer(i, img)
    return img


def color_jitter(key: jax.Array, img: jax.Array, strength: float) -> jax.Array:
    """torchvision ColorJitter(brightness=contrast=saturation=strength) with
    random order (order-sampling simplified to a fixed random permutation of 3)."""
    kb, kc, ks, ko = jax.random.split(key, 4)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - strength), maxval=1 + strength)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - strength), maxval=1 + strength)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - strength), maxval=1 + strength)

    def brightness(im):
        return _clip(im * fb)

    def contrast(im):
        gray_mean = jnp.mean(jnp.sum(im * _GRAY, axis=-1))
        return _clip((im - gray_mean) * fc + gray_mean)

    def saturation(im):
        gray = jnp.sum(im * _GRAY, axis=-1, keepdims=True)
        return _clip((im - gray) * fs + gray)

    fns = [brightness, contrast, saturation]
    perm = jax.random.permutation(ko, 3)
    for i in range(3):
        img = jax.lax.switch(perm[i], fns, img)
    return img


def gaussian_blur(key: jax.Array, img: jax.Array, radius_min=0.1, radius_max=2.0
                  ) -> jax.Array:
    """PIL GaussianBlur with random radius (3-Augment). Fixed 9-tap separable
    kernel whose sigma is traced."""
    radius = jax.random.uniform(key, (), minval=radius_min, maxval=radius_max)
    taps = jnp.arange(-4.0, 5.0)
    k1 = jnp.exp(-0.5 * (taps / jnp.maximum(radius, 1e-3)) ** 2)
    k1 = k1 / jnp.sum(k1)
    x = img.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
    x = jax.lax.conv_general_dilated(x, k1.reshape(1, 1, 9, 1), (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, k1.reshape(1, 1, 1, 9), (1, 1), "SAME")
    return x[:, 0].transpose(1, 2, 0)


def grayscale(img: jax.Array) -> jax.Array:
    gray = jnp.sum(img * _GRAY, axis=-1, keepdims=True)
    return jnp.broadcast_to(jnp.round(gray), img.shape)


def random_erasing(key: jax.Array, img: jax.Array, prob: float,
                   scale=(0.02, 1 / 3), ratio=(0.3, 10 / 3)) -> jax.Array:
    """timm RandomErasing mode='pixel' on the *normalized* image: one box per
    image filled with unit-normal noise."""
    H, W, C = img.shape
    k_do, k_area, k_ratio, k_top, k_left, k_noise = jax.random.split(key, 6)
    area = H * W
    target = area * jax.random.uniform(k_area, (), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(k_ratio, (), minval=math.log(ratio[0]),
                                   maxval=math.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    eh = jnp.clip(jnp.round(jnp.sqrt(target * aspect)), 1, H)
    ew = jnp.clip(jnp.round(jnp.sqrt(target / aspect)), 1, W)
    top = jnp.floor(jax.random.uniform(k_top) * (H - eh + 1))
    left = jnp.floor(jax.random.uniform(k_left) * (W - ew + 1))
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    box = ((yy >= top) & (yy < top + eh) & (xx >= left) & (xx < left + ew))
    noise = jax.random.normal(k_noise, img.shape, img.dtype)
    do = jax.random.bernoulli(k_do, prob)
    return jnp.where(do & box[..., None], noise, img)


# -----------------------------------------------------------------------------
# Full train/eval transforms
# -----------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static description of the train-time pipeline (from TrainConfig)."""

    input_size: int = 224
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    rand_augment: Optional[RandAugmentConfig] = None
    color_jitter: float = 0.0          # active only when rand_augment is None (timm)
    reprob: float = 0.25
    three_augment: bool = False        # DeiT-III 3-Augment (reference tools/augment.py)
    src: bool = False                  # simple resize+crop instead of RRC
    small_input_crop: bool = False     # ≤32px: RandomCrop(pad=4) (datasets.py:66-68)
    eval_crop_ratio: float = 0.875

    @classmethod
    def from_config(cls, cfg) -> "AugmentConfig":
        from deltakd_tpu.data.registry import DATASET_STATS

        stats = DATASET_STATS[cfg.dataset]
        ra = RandAugmentConfig.parse(cfg.aa) if not cfg.ThreeAugment else None
        return cls(
            input_size=cfg.input_size, mean=tuple(stats["mean"]),
            std=tuple(stats["std"]), rand_augment=ra,
            color_jitter=cfg.color_jitter if (ra is None or cfg.ThreeAugment) else 0.0,
            reprob=cfg.reprob if not cfg.ThreeAugment else 0.0,
            three_augment=cfg.ThreeAugment, src=cfg.src,
            small_input_crop=cfg.input_size <= 32,
            eval_crop_ratio=cfg.eval_crop_ratio)


def _normalize(img: jax.Array, ac: AugmentConfig) -> jax.Array:
    mean = jnp.asarray(ac.mean) * 255.0
    std = jnp.asarray(ac.std) * 255.0
    return (img - mean) / std


def train_transform(key: jax.Array, images_u8: jax.Array, ac: AugmentConfig
                    ) -> jax.Array:
    """[B, H, W, 3] uint8 → [B, S, S, 3] float32 normalized, fully on device."""
    B, H, W, _ = images_u8.shape
    S = ac.input_size
    fill = jnp.asarray([round(m * 255) for m in ac.mean], jnp.float32)

    def per_image(key, img_u8):
        img = img_u8.astype(jnp.float32)
        k_crop, k_flip, k_aug, k_erase = jax.random.split(key, 4)

        if ac.small_input_crop:
            # RandomCrop(S, padding=4) on native-resolution inputs
            k_t, k_l = jax.random.split(k_crop)
            top = jax.random.randint(k_t, (), 0, 9).astype(jnp.float32) - 4.0
            left = jax.random.randint(k_l, (), 0, 9).astype(jnp.float32) - 4.0
            mat = crop_matrix(top, left, jnp.float32(S), jnp.float32(S), S, S)
        elif ac.src:
            # 3-Augment --src: resize shorter side to S then RandomCrop(pad=4)
            scale = min(H, W) / S
            k_t, k_l = jax.random.split(k_crop)
            top = (jax.random.randint(k_t, (), 0, 9).astype(jnp.float32) - 4.0) * scale
            left = (jax.random.randint(k_l, (), 0, 9).astype(jnp.float32) - 4.0) * scale
            mat = crop_matrix(top, left, jnp.float32(H), jnp.float32(W), S, S)
        else:
            top, left, ch, cw = random_resized_crop_params(k_crop, H, W)
            mat = crop_matrix(top, left, ch, cw, S, S)

        flip = jax.random.bernoulli(k_flip)
        mat = jax.lax.cond(flip, lambda m: _compose(hflip_matrix(S), m),
                           lambda m: m, mat)
        img = warp_bilinear(img, mat, S, S, fill=None)
        img = _clip(img)

        if ac.three_augment:
            k_choice, k_blur, k_sol, k_cj = jax.random.split(k_aug, 4)
            choice = jax.random.randint(k_choice, (), 0, 3)
            img = jax.lax.switch(choice, [
                lambda im: grayscale(im),
                lambda im: jnp.where(im < 128.0, im, 255.0 - im),  # solarize p=1
                lambda im: gaussian_blur(k_blur, im),
            ], img)
            if ac.color_jitter > 0:
                img = color_jitter(k_cj, img, ac.color_jitter)
        else:
            if ac.rand_augment is not None:
                img = rand_augment(k_aug, img, ac.rand_augment, fill)
            elif ac.color_jitter > 0:
                img = color_jitter(k_aug, img, ac.color_jitter)

        img = _normalize(img, ac)
        if ac.reprob > 0:
            img = random_erasing(k_erase, img, ac.reprob)
        return img

    keys = jax.random.split(key, B)
    return jax.vmap(per_image)(keys, images_u8)


def eval_transform(images_u8: jax.Array, ac: AugmentConfig) -> jax.Array:
    """Resize(S/crop_ratio) + CenterCrop(S) + normalize
    (reference dataset/datasets.py:70-84). ≤32px inputs skip resizing."""
    B, H, W, _ = images_u8.shape
    S = ac.input_size
    img = images_u8.astype(jnp.float32)
    if S > 32:
        resize_to = int(S / ac.eval_crop_ratio)
        scale = min(H, W) / resize_to
        new_h, new_w = round(H / scale), round(W / scale)
        top = (new_h - S) / 2.0 * scale
        left = (new_w - S) / 2.0 * scale
        mat = crop_matrix(jnp.float32(top), jnp.float32(left),
                          jnp.float32(S * scale), jnp.float32(S * scale), S, S)
        img = jax.vmap(lambda im: warp_bilinear(im, mat, S, S))(img)
    return _normalize(img, ac)
