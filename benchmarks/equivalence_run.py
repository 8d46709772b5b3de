"""Outcome-level accuracy equivalence: torch host pipeline vs production run().

Round-4 verdict item 1. The single largest reimplementation in this framework
is the on-device augmentation pipeline (data/augment.py) — every op has a
PIL/torch golden test, and tests/test_dynamics.py proves 200-step optimizer
trajectory parity for all 9 objectives, but that harness feeds raw ``randn``
directly to the loss stack. This benchmark closes the remaining gap: it trains
the SAME recipe to convergence through BOTH stacks and compares final val
top-1 — with the augmentation pipeline *in the loop*:

* **torch stack**: host PIL transforms (RandomResizedCrop bicubic + flip +
  ColorJitter + Normalize + RandomErasing — implemented here directly on PIL,
  the layer torchvision wraps; torchvision itself is not installed in this
  image), timm-semantic mixup/cutmix, the timm-compatible TorchViT from
  tests/torch_ref.py, AdamW + the timm cosine schedule, the reference's loss
  combine rules (reference dataset/datasets.py:53-84, tools/engine.py:8-76,
  tools/train.py:215-367).
* **our stack**: the production ``run()`` driver end to end — host PNG decode,
  on-device train_transform/mixup, jitted KD step, masked eval.

Both stacks consume the same ImageFolder tree (procedurally generated,
class-structured 96px textures), the same torch-pretrained teacher weights,
and the same hyperparameters (read from one parsed TrainConfig so they cannot
diverge).

Three recipes (``--recipe``):

* ``base``: RRC + flip + jitter + erasing (no RandAugment) — the historical
  table, isolates the core pipeline.
* ``ra``: the reference's *default* training distribution —
  ``--aa rand-m9-mstd0.5-inc1`` (reference tools/train.py:156-160). The torch
  side runs :class:`HostRandAugment`, a timm-semantic RandAugment written
  directly on PIL/ImageOps (timm itself is not installed; torchvision's RA
  has different op semantics). timm disables color-jitter when ``--aa`` is
  set, so both sides drop jitter here. This puts the single largest rewrite
  in this framework — the composed-warp on-device RA with its documented
  op-order/geometry deviations — inside a trained-through accuracy
  comparison (round-4 verdict item 1).
* ``3aug``: DeiT-III 3-Augment with ``--ThreeAugment --src`` (reference
  tools/augment.py:18-117): resize + reflect-padded RandomCrop + flip +
  RandomChoice{grayscale, solarize, blur} + jitter, no erasing.

Usage:
    python benchmarks/equivalence_run.py                  # base (~1 h CPU)
    python benchmarks/equivalence_run.py --recipe ra --objective both
    python benchmarks/equivalence_run.py --quick          # smoke (~10 min)
    python benchmarks/equivalence_run.py --objective soft --seeds 0 1 2

Writes benchmarks/EQUIVALENCE.md (base) / EQUIVALENCE_RA.md /
EQUIVALENCE_3AUG.md with the result table; ``--ours-pixel-bf16`` flips the
production pipeline's bf16 pixel stage on (ours side only) and writes
``*_BF16.md`` — the recipe-safety probe for that flag.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

IMG_SRC = 256         # generated image size (both stacks crop/resize to 64).
                      # 256 matches FolderSource's host canvas exactly, so our
                      # stack applies NO host resample — both stacks start
                      # from identical raw pixels and the comparison isolates
                      # the augmentation/training implementations.
INPUT = 64
NUM_CLASSES = 8
MEAN = (0.5, 0.5, 0.5)
STD = (0.25, 0.25, 0.25)

# harness-scale models (timm has no such entries; registered at runtime so the
# production registry stays the reference's model zoo)
STUDENT_SOFT = "deit_eqmicro_distilled_patch8_64"
STUDENT_PLAIN = "deit_eqmicro_patch8_64"
TEACHER = "deit_eqmini_distilled_patch8_64"


# ---------------------------------------------------------------------------
# Dataset: 8 procedural texture classes = 4 patterns x 2 frequency bands,
# with per-image phase/scale/brightness/noise variation so val accuracy sits
# below the ceiling and pipeline differences have room to show.
# ---------------------------------------------------------------------------

def _texture(rng: np.random.RandomState, cls: int) -> np.ndarray:
    pattern, band = cls % 4, cls // 4
    # periods scale with the canvas so angular frequency at the final 64px
    # input is source-size-invariant
    scale = IMG_SRC / 96.0
    period = (rng.uniform(6, 9) if band == 0 else rng.uniform(14, 20)) * scale
    phase = rng.uniform(0, 2 * math.pi)
    yy, xx = np.meshgrid(np.arange(IMG_SRC), np.arange(IMG_SRC), indexing="ij")
    theta = rng.uniform(-0.25, 0.25)  # small rotation jitter
    yr = yy * math.cos(theta) - xx * math.sin(theta)
    xr = yy * math.sin(theta) + xx * math.cos(theta)
    if pattern == 0:
        v = np.sin(2 * math.pi * yr / period + phase)
    elif pattern == 1:
        v = np.sin(2 * math.pi * xr / period + phase)
    elif pattern == 2:
        v = np.sin(2 * math.pi * yr / period + phase) * \
            np.sin(2 * math.pi * xr / period + phase)
    else:
        r = np.sqrt((yr - IMG_SRC / 2) ** 2 + (xr - IMG_SRC / 2) ** 2)
        v = np.sin(2 * math.pi * r / period + phase)
    base = rng.uniform(90, 165)
    amp = rng.uniform(45, 80)
    img = base + amp * v[..., None] * rng.uniform(0.7, 1.3, (1, 1, 3))
    img = img + rng.normal(0, 18, (IMG_SRC, IMG_SRC, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_dataset(root: str, n_train_per_class: int, n_val_per_class: int,
                     seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.RandomState(seed)
    for split, n in (("train", n_train_per_class), ("val", n_val_per_class)):
        for cls in range(NUM_CLASSES):
            d = os.path.join(root, split, f"class_{cls:02d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                Image.fromarray(_texture(rng, cls)).save(
                    os.path.join(d, f"{i:04d}.png"))
    with open(os.path.join(root, "meta.json"), "w") as f:
        json.dump({"img_src": IMG_SRC, "n_train": n_train_per_class,
                   "n_val": n_val_per_class, "seed": seed}, f)


def dataset_matches(root: str, n_train: int, n_val: int) -> bool:
    """Refuse to silently reuse a stale workdir generated with different
    sizes/canvas (the harness caches the dataset AND the teacher on disk)."""
    meta_path = os.path.join(root, "meta.json")
    if not os.path.isfile(meta_path):
        return False
    with open(meta_path) as f:
        meta = json.load(f)
    return (meta.get("img_src") == IMG_SRC and meta.get("n_train") == n_train
            and meta.get("n_val") == n_val)


# ---------------------------------------------------------------------------
# torch stack
# ---------------------------------------------------------------------------

class HostRandAugment:
    """timm-semantic RandAugment (``rand-m9-mstd0.5-inc1``) written directly
    on PIL/ImageOps — the layer timm wraps (timm is not installed in this
    image; tests/test_data.py:27-58 already golden-matches our on-device op
    kernels against these exact PIL primitives). Semantics follow timm
    auto_augment.py: ``num_layers`` draws, each op uniform over the
    15-entry increasing-transform table, gated by ``prob``, magnitude
    ``gauss(m, mstd)`` clipped to [0, 10], increasing level→arg maps,
    bicubic resampling for geometric ops (the recipe's --interpolation),
    dataset-mean fill."""

    def __init__(self, rng: np.random.RandomState, magnitude=9.0, mstd=0.5,
                 num_layers=2, prob=0.5):
        self.rng = rng
        self.m, self.mstd = magnitude, mstd
        self.num_layers, self.prob = num_layers, prob
        self.fill = tuple(min(255, round(255 * m)) for m in MEAN)

    def _neg(self, v):
        return -v if self.rng.rand() < 0.5 else v

    def _enhance(self, img, enhancer, m):
        from PIL import ImageEnhance

        factor = max(0.1, 1.0 + self._neg(m / 10.0 * 0.9))
        return getattr(ImageEnhance, enhancer)(img).enhance(factor)

    def _affine(self, img, data):
        from PIL import Image

        return img.transform(img.size, Image.AFFINE, data, Image.BICUBIC,
                             fillcolor=self.fill)

    def _apply_op(self, img, op, m):
        from PIL import Image, ImageOps

        W, H = img.size
        if op == 0:
            return ImageOps.autocontrast(img)
        if op == 1:
            return ImageOps.equalize(img)
        if op == 2:
            return ImageOps.invert(img)
        if op == 3:  # Rotate
            return img.rotate(self._neg(m / 10.0 * 30.0), Image.BICUBIC,
                              fillcolor=self.fill)
        if op == 4:  # PosterizeIncreasing; clamp to >=1 bit like our kernel
            return ImageOps.posterize(img, max(1, 4 - int(m / 10.0 * 4)))
        if op == 5:  # SolarizeIncreasing
            return ImageOps.solarize(img, 256 - int(m / 10.0 * 256))
        if op == 6:  # SolarizeAdd (threshold 128)
            arr = np.asarray(img, np.int16)
            add = int(m / 10.0 * 110)
            arr = np.where(arr < 128, np.clip(arr + add, 0, 255), arr)
            return Image.fromarray(arr.astype(np.uint8))
        if op == 7:
            return self._enhance(img, "Color", m)
        if op == 8:
            return self._enhance(img, "Contrast", m)
        if op == 9:
            return self._enhance(img, "Brightness", m)
        if op == 10:
            return self._enhance(img, "Sharpness", m)
        if op == 11:  # ShearX
            return self._affine(img, (1, self._neg(m / 10.0 * 0.3), 0,
                                      0, 1, 0))
        if op == 12:  # ShearY
            return self._affine(img, (1, 0, 0,
                                      self._neg(m / 10.0 * 0.3), 1, 0))
        if op == 13:  # TranslateXRel (pct 0.45)
            return self._affine(img, (1, 0, self._neg(m / 10.0 * 0.45 * W),
                                      0, 1, 0))
        # 14: TranslateYRel
        return self._affine(img, (1, 0, 0,
                                  0, 1, self._neg(m / 10.0 * 0.45 * H)))

    def __call__(self, img):
        for _ in range(self.num_layers):
            op = self.rng.randint(0, 15)
            if self.rng.rand() > self.prob:
                continue
            m = float(np.clip(self.rng.normal(self.m, self.mstd), 0.0, 10.0))
            img = self._apply_op(img, op, m)
        return img


class HostPipeline:
    """The torchvision/timm host transform stack, written directly on PIL
    (torchvision is not installed in this image; it wraps exactly these PIL
    calls). Semantics follow torchvision's documented algorithms:
    RandomResizedCrop (scale (0.08,1), log-ratio (3/4,4/3), 10 tries then
    center fallback), RandomHorizontalFlip, ColorJitter via ImageEnhance in
    random order, Normalize, RandomErasing(value='random'). ``recipe`` picks
    the aug stack between RRC+flip and normalize: 'base' = ColorJitter;
    'ra' = HostRandAugment, jitter off (timm drops jitter when --aa is set,
    timm transforms_factory.py); '3aug' = reference tools/augment.py:84-117
    (resize + reflect-pad RandomCrop + flip + RandomChoice{gray, solarize,
    blur} + jitter, no erasing)."""

    def __init__(self, train: bool, rng: np.random.RandomState,
                 recipe: str = "base"):
        self.train = train
        self.rng = rng
        self.recipe = recipe
        self.ra = HostRandAugment(rng) if (train and recipe == "ra") else None

    def _rrc(self, img):
        from PIL import Image

        W, H = img.size
        area = H * W
        for _ in range(10):
            target = area * self.rng.uniform(0.08, 1.0)
            ar = math.exp(self.rng.uniform(math.log(3 / 4), math.log(4 / 3)))
            w = int(round(math.sqrt(target * ar)))
            h = int(round(math.sqrt(target / ar)))
            if 0 < w <= W and 0 < h <= H:
                top = self.rng.randint(0, H - h + 1)
                left = self.rng.randint(0, W - w + 1)
                return img.resize((INPUT, INPUT), Image.BICUBIC,
                                  box=(left, top, left + w, top + h))
        side = min(H, W)
        top, left = (H - side) // 2, (W - side) // 2
        return img.resize((INPUT, INPUT), Image.BICUBIC,
                          box=(left, top, left + side, top + side))

    def _jitter(self, img, j=0.4):
        from PIL import ImageEnhance

        ops = [ImageEnhance.Brightness, ImageEnhance.Contrast,
               ImageEnhance.Color]
        order = self.rng.permutation(3)
        for i in order:
            f = self.rng.uniform(max(0.0, 1 - j), 1 + j)
            img = ops[i](img).enhance(f)
        return img

    def _src_crop(self, img):
        """reference tools/augment.py:91-96 (--src): Resize(S, bicubic) +
        RandomCrop(S, padding=4, padding_mode='reflect')."""
        from PIL import Image

        W, H = img.size
        scale = INPUT / min(W, H)
        img = img.resize((round(W * scale), round(H * scale)), Image.BICUBIC)
        arr = np.pad(np.asarray(img), ((4, 4), (4, 4), (0, 0)),
                     mode="reflect")
        top = self.rng.randint(0, arr.shape[0] - INPUT + 1)
        left = self.rng.randint(0, arr.shape[1] - INPUT + 1)
        return Image.fromarray(arr[top:top + INPUT, left:left + INPUT])

    def _three_aug_choice(self, img):
        """RandomChoice{Grayscale(3), Solarization(128), GaussianBlur} —
        reference tools/augment.py:18-64,105-107."""
        from PIL import ImageFilter, ImageOps

        pick = self.rng.randint(0, 3)
        if pick == 0:
            return img.convert("L").convert("RGB")
        if pick == 1:
            return ImageOps.solarize(img)
        return img.filter(ImageFilter.GaussianBlur(
            radius=self.rng.uniform(0.1, 2.0)))

    def __call__(self, img):
        import torch
        from PIL import Image

        if self.train:
            if self.recipe == "3aug":
                img = self._src_crop(img)
                if self.rng.rand() < 0.5:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                img = self._three_aug_choice(img)
                img = self._jitter(img)
            else:
                img = self._rrc(img)
                if self.rng.rand() < 0.5:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
                if self.ra is not None:
                    img = self.ra(img)
                else:
                    img = self._jitter(img)
        else:
            W, H = img.size
            size = int(INPUT / 0.875)
            scale = size / min(W, H)
            img = img.resize((round(W * scale), round(H * scale)),
                             Image.BICUBIC)
            W, H = img.size
            top, left = (H - INPUT) // 2, (W - INPUT) // 2
            img = img.crop((left, top, left + INPUT, top + INPUT))
        x = torch.from_numpy(
            np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
        x = (x - torch.tensor(MEAN)[:, None, None]) /             torch.tensor(STD)[:, None, None]
        # no RandomErasing under 3-Augment (the reference swaps the whole
        # transform for new_data_aug_generator, which has none)
        if self.train and self.recipe != "3aug" and self.rng.rand() < 0.25:
            # RandomErasing: scale (0.02, 1/3), log-ratio (0.3, 3.3), noise fill
            for _ in range(10):
                target = INPUT * INPUT * self.rng.uniform(0.02, 1 / 3)
                ar = math.exp(self.rng.uniform(math.log(0.3), math.log(3.3)))
                h = int(round(math.sqrt(target * ar)))
                w = int(round(math.sqrt(target / ar)))
                if 0 < h <= INPUT and 0 < w <= INPUT:
                    top = self.rng.randint(0, INPUT - h + 1)
                    left = self.rng.randint(0, INPUT - w + 1)
                    x[:, top:top + h, left:left + w] = torch.from_numpy(
                        self.rng.randn(3, h, w).astype(np.float32))
                    break
        return x


class FolderDataset:
    """Minimal ImageFolder (torchvision is not installed)."""

    def __init__(self, root: str, pipeline: HostPipeline):
        self.samples = []
        for ci, cls in enumerate(sorted(os.listdir(root))):
            d = os.path.join(root, cls)
            for f in sorted(os.listdir(d)):
                self.samples.append((os.path.join(d, f), ci))
        self.pipeline = pipeline

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        from PIL import Image

        path, label = self.samples[i]
        return self.pipeline(Image.open(path).convert("RGB")), label


class TorchMixup:
    """timm Mixup 'batch' mode semantics (what the reference configures,
    tools/train.py:288-295); mirror of data/mixup.py apply_mixup."""

    def __init__(self, mixup_alpha, cutmix_alpha, prob, switch_prob,
                 smoothing, num_classes, rng):
        self.ma, self.ca, self.prob = mixup_alpha, cutmix_alpha, prob
        self.sp, self.sm, self.nc = switch_prob, smoothing, num_classes
        self.rng = rng

    def _one_hot(self, labels):
        import torch

        on = 1.0 - self.sm + self.sm / self.nc
        off = self.sm / self.nc
        t = torch.full((labels.shape[0], self.nc), off)
        t.scatter_(1, labels[:, None], on)
        return t

    def __call__(self, images, labels):
        import torch

        targets = self._one_hot(labels)
        if self.rng.rand() >= self.prob:
            return images, targets
        use_cutmix = self.ca > 0 and (self.ma <= 0 or self.rng.rand() < self.sp)
        if use_cutmix:
            lam = float(self.rng.beta(self.ca, self.ca))
            H, W = images.shape[2:]
            ratio = math.sqrt(1.0 - lam)
            ch, cw = int(H * ratio), int(W * ratio)
            cy, cx = self.rng.randint(H), self.rng.randint(W)
            y0, y1 = max(cy - ch // 2, 0), min(cy + ch // 2, H)
            x0, x1 = max(cx - cw // 2, 0), min(cx + cw // 2, W)
            images = images.clone()
            images[:, :, y0:y1, x0:x1] = images.flip(0)[:, :, y0:y1, x0:x1]
            lam = 1.0 - (y1 - y0) * (x1 - x0) / float(H * W)
        else:
            lam = float(self.rng.beta(self.ma, self.ma))
            images = lam * images + (1.0 - lam) * images.flip(0)
        targets = lam * targets + (1.0 - lam) * targets.flip(0)
        return images, targets


def _cosine_lr(cfg, epoch: int) -> float:
    """timm CosineLRScheduler at integer epochs (same formula as
    train/optim.py cosine_epoch_schedule, golden-tested there)."""
    if epoch < cfg.warmup_epochs:
        return cfg.warmup_lr + epoch * (cfg.lr - cfg.warmup_lr) / max(
            cfg.warmup_epochs, 1)
    if epoch >= cfg.epochs:
        return cfg.min_lr
    t = min(max(epoch, 0), cfg.epochs)
    return cfg.min_lr + 0.5 * (cfg.lr - cfg.min_lr) * (
        1.0 + math.cos(math.pi * t / cfg.epochs))


def _adamw_groups(model_params, extra_params=()):
    """timm-style decay split: no weight decay for 1-D params (LN, biases)
    or the token/pos-embed parameters."""
    decay, no_decay = [], []
    for p in list(model_params) + list(extra_params):
        (decay if p.ndim >= 2 else no_decay).append(p)
    return decay, no_decay


def _soft_ce(logits, targets):
    import torch.nn.functional as F

    return (-targets * F.log_softmax(logits, dim=-1)).sum(dim=-1).mean()


def _torch_eval(model, loader):
    import torch

    model.eval()
    correct = total = 0
    with torch.no_grad():
        for x, y in loader:
            logits = model(x)
            correct += (logits.argmax(-1) == y).sum().item()
            total += y.shape[0]
    model.train()
    return 100.0 * correct / total


def torch_train_teacher(cfg, root: str, out_path: str, epochs: int) -> float:
    """Supervised pretraining of the teacher (both stacks then import these
    exact weights)."""
    import torch

    from torch_ref import TorchViT

    torch.manual_seed(1234)
    train_ds = FolderDataset(os.path.join(root, "train"),
                             HostPipeline(True, np.random.RandomState(1234)))
    val_ds = FolderDataset(os.path.join(root, "val"),
                           HostPipeline(False, np.random.RandomState(0)))
    g = torch.Generator().manual_seed(1234)
    train_ld = torch.utils.data.DataLoader(
        train_ds, batch_size=cfg.batch_size, shuffle=True, generator=g,
        num_workers=0, drop_last=True)
    val_ld = torch.utils.data.DataLoader(val_ds, batch_size=cfg.batch_size,
                                         num_workers=0)
    model = TorchViT(img_size=INPUT, patch=8, dim=128, depth=6, num_heads=4,
                     num_classes=NUM_CLASSES, distilled=True)
    decay, no_decay = _adamw_groups(model.parameters())
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": cfg.weight_decay},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=cfg.lr, betas=(0.9, 0.999), eps=cfg.opt_eps)
    mixup = TorchMixup(cfg.mixup, cfg.cutmix, cfg.mixup_prob,
                       cfg.mixup_switch_prob, cfg.smoothing, NUM_CLASSES,
                       np.random.RandomState(1234))
    for epoch in range(epochs):
        lr = _cosine_lr(cfg.replace(epochs=epochs), epoch)
        for grp in opt.param_groups:
            grp["lr"] = lr
        for x, y in train_ld:
            x, targets = mixup(x, y)
            cls_logits, dist_logits, _ = model.forward_with_features(x)
            loss = 0.5 * (_soft_ce(cls_logits, targets)
                          + _soft_ce(dist_logits, targets))
            opt.zero_grad()
            loss.backward()
            opt.step()
    acc = _torch_eval(model, val_ld)
    torch.save({"model": model.state_dict()}, out_path)
    return acc


def _timm_init(model) -> None:
    """The reference creates its student via timm ``create_model`` (reference
    model/models.py), whose DeiT init is trunc_normal(std=.02) on every
    Linear/Conv weight with zeroed biases — NOT torch's kaiming_uniform
    defaults. Our production models implement exactly that
    (deltakd_tpu/models/vit.py trunc_init), so the harness's torch student
    must too; otherwise the two stacks train from different init
    distributions. (Found via wasskd: its ×5 feature term makes the early
    trajectory init-sensitive — with torch-default init the torch side
    learned ~2x faster at tiny-epoch scale, with identical loss/grad
    machinery proven by benchmarks/scratch_wasskd_shapes.py.)"""
    import torch
    import torch.nn as nn

    for m in model.modules():
        if isinstance(m, (nn.Linear, nn.Conv2d)):
            nn.init.trunc_normal_(m.weight, std=0.02)
            if m.bias is not None:
                nn.init.zeros_(m.bias)
    for tok in ("cls_token", "dist_token", "pos_embed"):
        if hasattr(model, tok):
            nn.init.trunc_normal_(getattr(model, tok), std=0.02)


def torch_train_student(cfg, root: str, teacher_path: str, objective: str,
                        seed: int, recipe: str = "base") -> dict:
    """The torch analogue of run(): host transforms -> TorchViT -> reference
    loss combine -> AdamW/cosine -> center-crop eval."""
    import torch
    import torch.nn as nn

    from torch_ref import (TorchViT, torch_mgd, torch_soft_kd, torch_vitkd,
                           torch_wasskd_l1)

    torch.manual_seed(seed)
    train_ds = FolderDataset(
        os.path.join(root, "train"),
        HostPipeline(True, np.random.RandomState(seed), recipe))
    val_ds = FolderDataset(os.path.join(root, "val"),
                           HostPipeline(False, np.random.RandomState(0)))
    g = torch.Generator().manual_seed(seed)
    train_ld = torch.utils.data.DataLoader(
        train_ds, batch_size=cfg.batch_size, shuffle=True, generator=g,
        num_workers=0, drop_last=True)
    val_ld = torch.utils.data.DataLoader(val_ds, batch_size=cfg.batch_size,
                                         num_workers=0)

    teacher = TorchViT(img_size=INPUT, patch=8, dim=128, depth=6, num_heads=4,
                       num_classes=NUM_CLASSES, distilled=True)
    teacher.load_state_dict(torch.load(teacher_path)["model"])
    teacher.eval()

    distilled = objective == "soft"
    student = TorchViT(img_size=INPUT, patch=8, dim=64, depth=4, num_heads=4,
                       num_classes=NUM_CLASSES, distilled=distilled)
    _timm_init(student)  # reference init (timm create_model), see helper
    aux_mods = []
    if objective == "mgd":
        align = nn.Linear(64, 128)
        mask_token = nn.Parameter(torch.zeros(1, 1, 128))
        gen1 = nn.Conv2d(128, 128, 3, padding=1)
        gen2 = nn.Conv2d(128, 128, 3, padding=1)
        aux_mods = [align, gen1, gen2]
        aux_params = (list(align.parameters()) + [mask_token]
                      + list(gen1.parameters()) + list(gen2.parameters()))
    elif objective == "wasskd":
        # reference model/loss.py:187-199 — one align linear per block 0-2
        wass_aligns = [nn.Linear(64, 128) for _ in range(3)]
        aux_mods = list(wass_aligns)
        aux_params = [p for m in wass_aligns for p in m.parameters()]
    elif objective == "vitkd":
        # reference model/models.py:76-88 — blocks 0,1 mimicking aligns +
        # block-11 generation head (mask_token fill + 2 convs)
        align2 = [nn.Linear(64, 128) for _ in range(2)]
        align = nn.Linear(64, 128)
        mask_token = nn.Parameter(torch.zeros(1, 1, 128))
        gen1 = nn.Conv2d(128, 128, 3, padding=1)
        gen2 = nn.Conv2d(128, 128, 3, padding=1)
        aux_mods = align2 + [align, gen1, gen2]
        aux_params = ([p for m in aux_mods for p in m.parameters()]
                      + [mask_token])
    else:
        aux_params = []

    decay, no_decay = _adamw_groups(student.parameters(), aux_params)
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": cfg.weight_decay},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=cfg.lr, betas=(0.9, 0.999), eps=cfg.opt_eps)
    mixup = TorchMixup(cfg.mixup, cfg.cutmix, cfg.mixup_prob,
                       cfg.mixup_switch_prob, cfg.smoothing, NUM_CLASSES,
                       np.random.RandomState(seed))

    best = 0.0
    for epoch in range(cfg.epochs):
        lr = _cosine_lr(cfg, epoch)
        for grp in opt.param_groups:
            grp["lr"] = lr
        for x, y in train_ld:
            x, targets = mixup(x, y)
            with torch.no_grad():
                t_logits = teacher(x)
                if objective in ("mgd", "wasskd", "vitkd"):
                    _, _, t_feats = teacher.forward_with_features(x)
            cls_logits, dist_logits, s_feats = student.forward_with_features(x)
            base = _soft_ce(cls_logits, targets)
            if objective == "soft":
                distill = torch_soft_kd(dist_logits, t_logits, cfg.tau)
                loss = base * (1.0 - cfg.alpha) + distill * cfg.alpha
            elif objective == "wasskd":
                distill = torch_wasskd_l1(s_feats, t_feats, wass_aligns)
                loss = base + distill * 5.0  # reference loss.py:226
            elif objective == "vitkd":
                noise = torch.rand(x.shape[0], s_feats[-1].shape[1] - 1)
                distill = torch_vitkd(s_feats, t_feats, align2, align,
                                      mask_token, gen1, gen2, noise)
                loss = base + distill  # additive early-return, loss.py:78
            else:
                noise = torch.rand(x.shape[0],
                                   s_feats[-1].shape[1] - 1)
                distill = torch_mgd(s_feats[-1], t_feats[-1], align,
                                    mask_token, gen1, gen2, noise,
                                    cfg.mgd_mask_ratio, cfg.mgd_alpha)
                loss = base + distill
            opt.zero_grad()
            loss.backward()
            opt.step()
        acc = _torch_eval(student, val_ld)
        best = max(best, acc)
    return {"final_acc": acc, "best_acc": best}


# ---------------------------------------------------------------------------
# our stack (production run())
# ---------------------------------------------------------------------------

def _register_harness_entries() -> None:
    from deltakd_tpu.data.registry import DATASET_STATS
    from deltakd_tpu.models.registry import MODEL_REGISTRY
    from deltakd_tpu.models.vit import ViTConfig

    DATASET_STATS.setdefault("texture8", {
        "mean": MEAN, "std": STD, "num_classes": NUM_CLASSES})
    MODEL_REGISTRY.setdefault(STUDENT_SOFT, ViTConfig(
        img_size=INPUT, patch_size=8, embed_dim=64, depth=4, num_heads=4,
        distilled=True))
    MODEL_REGISTRY.setdefault(STUDENT_PLAIN, ViTConfig(
        img_size=INPUT, patch_size=8, embed_dim=64, depth=4, num_heads=4))
    MODEL_REGISTRY.setdefault(TEACHER, ViTConfig(
        img_size=INPUT, patch_size=8, embed_dim=128, depth=6, num_heads=4,
        distilled=True))


def make_cfg(root: str, teacher_path: str, objective: str, seed: int,
             epochs: int, workdir: str, recipe: str = "base",
             pixel_bf16: bool = False):
    from deltakd_tpu.configs import parse_args

    student = STUDENT_SOFT if objective == "soft" else STUDENT_PLAIN
    run_id = f"ours_{objective}_{seed}" + \
        ("" if recipe == "base" else f"_{recipe}") + \
        ("_bf16" if pixel_bf16 else "")
    argv = [
        "--dataset", "texture8", "--data-path", root,
        "--input-size", str(INPUT), "--batch-size", "64",
        "--epochs", str(epochs), "--warmup-epochs", "3",
        "--lr", "5e-4", "--min-lr", "1e-5", "--warmup-lr", "1e-6",
        "--weight-decay", "0.05", "--dtype", "float32",
        "--prng-impl", "threefry2x32",
        "--drop-path-rate", "0.0",
        # recipe: 'ra' = the reference's default --aa (timm then ignores
        # --color-jitter); '3aug' swaps the transform like reference
        # train.py:261-262 (from_config ignores --aa/--reprob under it)
        "--aa", "rand-m9-mstd0.5-inc1" if recipe == "ra" else "",
        "--color-jitter", "0.4", "--reprob", "0.25",
        "--mixup", "0.8", "--cutmix", "1.0", "--smoothing", "0.1",
        "--interpolation", "bicubic", "--no-repeated-aug",
        "--distillation-type", objective,
        "--student-model", student, "--teacher-model", TEACHER,
        "--teacher-checkpoint", teacher_path,
        "--seed", str(seed),
        "--log-file", os.path.join(workdir, f"{run_id}.log"),
        "--save-dir", os.path.join(workdir, run_id)]
    if recipe == "3aug":
        argv += ["--ThreeAugment", "--src"]
    # Pin the pixel-stage dtype explicitly: the torch side is fp32, so the
    # default comparison must run ours fp32 too regardless of the production
    # default (bf16 since round 5); the bf16 probe opts in deliberately.
    argv += ["--aug-pixel-bf16" if pixel_bf16 else "--no-aug-pixel-bf16"]
    return parse_args(argv)


def ours_train_student(root: str, teacher_path: str, objective: str,
                       seed: int, epochs: int, workdir: str,
                       recipe: str = "base", pixel_bf16: bool = False) -> dict:
    from deltakd_tpu.train.loop import run

    cfg = make_cfg(root, teacher_path, objective, seed, epochs, workdir,
                   recipe, pixel_bf16)
    metrics = run(cfg)
    return {"final_acc": metrics["val_acc1"],
            "best_acc": metrics["best_val_acc"]}


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _teacher_fingerprint(teacher_path: str) -> str:
    """Cheap content fingerprint so cached student results are invalidated if
    the cached teacher checkpoint is ever regenerated (both sides distill from
    these exact weights)."""
    import hashlib

    h = hashlib.sha1()
    with open(teacher_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()[:16]


def _load_cache(path: str) -> dict:
    if os.path.isfile(path):
        with open(path) as f:
            return json.load(f)
    return {}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced epochs/data for a smoke run")
    ap.add_argument("--objective",
                    choices=["soft", "mgd", "wasskd", "vitkd", "both", "all"],
                    default="both",
                    help="'both' = soft+mgd (historical); 'all' adds wasskd "
                         "(l1: sorted-L1/bitonic machinery) and vitkd "
                         "(random_masking + mask_token fill + conv "
                         "generation head)")
    ap.add_argument("--recipe", choices=["base", "ra", "3aug"],
                    default="base",
                    help="augmentation recipe on BOTH stacks: base = "
                         "RRC+flip+jitter+erasing; ra = the reference "
                         "default --aa rand-m9-mstd0.5-inc1; 3aug = "
                         "--ThreeAugment --src")
    ap.add_argument("--ours-pixel-bf16", action="store_true",
                    help="run the production side with --aug-pixel-bf16 "
                         "(recipe-safety probe; torch side stays fp32)")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--workdir", default="/tmp/deltakd_equivalence")
    ap.add_argument("--out", default=None,
                    help="output table path (default: EQUIVALENCE.md with "
                         "recipe/bf16 suffixes)")
    args = ap.parse_args()
    if args.out is None:
        suffix = {"base": "", "ra": "_RA", "3aug": "_3AUG"}[args.recipe]
        if args.ours_pixel_bf16:
            suffix += "_BF16"
        args.out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                f"EQUIVALENCE{suffix}.md")

    import jax

    jax.config.update("jax_platforms", "cpu")  # hermetic CPU comparison
    _register_harness_entries()

    n_train, n_val = (32, 16) if args.quick else (128, 32)
    epochs = args.epochs or (6 if args.quick else 40)
    teacher_epochs = 4 if args.quick else 30
    objectives = {"both": ["soft", "mgd"],
                  "all": ["soft", "mgd", "wasskd", "vitkd"]}.get(
                      args.objective, [args.objective])

    root = os.path.join(args.workdir, "data")
    os.makedirs(args.workdir, exist_ok=True)
    if not dataset_matches(root, n_train, n_val):
        if os.path.isdir(root):
            import shutil

            print(f"stale/mismatched dataset under {root} — regenerating "
                  f"(and discarding the cached teacher, which was trained "
                  f"on it)")
            shutil.rmtree(root)
            stale_teacher = os.path.join(args.workdir, "teacher.pth")
            if os.path.isfile(stale_teacher):
                os.remove(stale_teacher)
        print(f"generating dataset under {root} ...")
        generate_dataset(root, n_train, n_val, seed=0)

    # one parsed config is the single source of hyperparameters for BOTH sides
    ref_cfg = make_cfg(root, "", "soft", 0, epochs, args.workdir, args.recipe)

    teacher_path = os.path.join(args.workdir, "teacher.pth")
    teacher_acc_path = os.path.join(args.workdir, "teacher_acc.json")
    if not os.path.isfile(teacher_path):
        t0 = time.time()
        teacher_acc = torch_train_teacher(ref_cfg, root, teacher_path,
                                          teacher_epochs)
        with open(teacher_acc_path, "w") as f:
            json.dump({"val_acc1": teacher_acc}, f)
        print(f"teacher pretrained: val top-1 {teacher_acc:.2f}% "
              f"({time.time() - t0:.0f}s)")
    elif os.path.isfile(teacher_acc_path):
        with open(teacher_acc_path) as f:
            teacher_acc = json.load(f)["val_acc1"]
    else:
        teacher_acc = None

    # results cache: extending --seeds re-runs only the new (stack, objective,
    # seed) runs — both stacks are seed-deterministic, so finished runs are
    # facts. Keyed per stack by everything that changes the outcome, incl. the
    # teacher weights. The torch key carries a version ("torch2" = timm-init
    # student, see _timm_init) so harness-fidelity fixes invalidate only the
    # side they change.
    cache_path = os.path.join(args.workdir, "results_cache.json")
    cache = _load_cache(cache_path)
    tfp = _teacher_fingerprint(teacher_path)

    def _one(stack: str, objective: str, seed: int) -> dict:
        tag = f"|seed{seed}|ep{epochs}|n{n_train}x{n_val}|teacher:{tfp}"
        rec = "" if args.recipe == "base" else f"|{args.recipe}"
        bf = "|bf16" if (stack == "ours" and args.ours_pixel_bf16) else ""
        key = (("torch2|" if stack == "torch" else "ours|")
               + objective + rec + bf + tag)
        if key in cache:
            print(f"[{objective} seed {seed}] {stack} cached: "
                  f"{cache[key]['final_acc']:.2f}%")
            return cache[key]
        t0 = time.time()
        if stack == "torch":
            r = torch_train_student(ref_cfg.replace(epochs=epochs), root,
                                    teacher_path, objective, seed,
                                    args.recipe)
        else:
            r = ours_train_student(root, teacher_path, objective, seed,
                                   epochs, args.workdir, args.recipe,
                                   args.ours_pixel_bf16)
        print(f"[{objective} seed {seed}] {stack} {r['final_acc']:.2f}% "
              f"({time.time() - t0:.0f}s)")
        cache[key] = r
        with open(cache_path, "w") as f:
            json.dump(cache, f, indent=1)
        return r

    def _write_table(results, done_objectives, partial: bool) -> bool:
        """Verdict per objective: |mean delta| within the seed-noise band.
        Called after every completed objective (not just at the end) so a
        long run interrupted by the session clock still leaves a committable
        table covering the objectives it finished."""
        recipe_desc = {
            "base": "RRC(bicubic) + flip + jitter 0.4 + erasing 0.25 "
                    "(RandAugment off — the RA recipe has its own table, "
                    "EQUIVALENCE_RA.md)",
            "ra": "RRC(bicubic) + flip + RandAugment rand-m9-mstd0.5-inc1 "
                  "(the reference's default --aa; jitter off per timm) + "
                  "erasing 0.25 — torch side runs a timm-semantic PIL "
                  "RandAugment (HostRandAugment), ours the on-device "
                  "composed-warp RA",
            "3aug": "--ThreeAugment --src: resize + reflect-pad RandomCrop "
                    "+ flip + RandomChoice{gray, solarize, blur} + jitter "
                    "0.4, no erasing (reference tools/augment.py)",
        }[args.recipe]
        bf16_note = (" Production side runs --aug-pixel-bf16 (torch side "
                     "fp32) — a recipe-safety probe for that flag."
                     if args.ours_pixel_bf16 else "")
        lines = ["# Outcome-level equivalence: torch stack vs production run()",
                 "",
                 f"Dataset: {NUM_CLASSES}-class procedural textures, "
                 f"{n_train}/{n_val} imgs/class train/val at {IMG_SRC}px, "
                 f"input {INPUT}px. Teacher: dim128/depth6 distilled ViT, "
                 f"torch-pretrained (shared weights via --teacher-checkpoint). "
                 f"Student: dim64/depth4. {epochs} epochs, recipe: "
                 f"{recipe_desc} + mixup 0.8/cutmix 1.0 + smoothing 0.1, "
                 f"AdamW lr 5e-4 cosine.{bf16_note}", ""]
        if teacher_acc is not None:
            lines.append(f"Teacher val top-1: {teacher_acc:.2f}%")
            lines.append("")
        lines += ["| objective | seed | torch final | ours final | torch best |"
                  " ours best |",
                  "|---|---|---|---|---|---|"]
        ok = True
        for objective in done_objectives:
            t_acc = [results[(objective, s)]["torch"]["final_acc"]
                     for s in args.seeds]
            o_acc = [results[(objective, s)]["ours"]["final_acc"]
                     for s in args.seeds]
            for s in args.seeds:
                r = results[(objective, s)]
                lines.append(
                    f"| {objective} | {s} | {r['torch']['final_acc']:.2f} "
                    f"| {r['ours']['final_acc']:.2f} "
                    f"| {r['torch']['best_acc']:.2f} "
                    f"| {r['ours']['best_acc']:.2f} |")
            delta = abs(float(np.mean(o_acc)) - float(np.mean(t_acc)))
            spread = max(float(np.ptp(t_acc)), float(np.ptp(o_acc)))
            # capped at 3 points: with 2 seeds the spread-scaled band
            # inflated to 5.86 on soft (round-4 review) — wide enough to
            # miss a real regression. ≥3 seeds keep the mean estimate
            # tight enough for the cap to be meaningful.
            band = max(2.0, min(1.5 * spread, 3.0))
            verdict = "WITHIN" if delta <= band else "OUTSIDE"
            ok = ok and delta <= band
            lines.append(
                f"| {objective} | mean | {np.mean(t_acc):.2f} "
                f"| {np.mean(o_acc):.2f} | Δ={delta:.2f} "
                f"| {verdict} band {band:.2f} |")
        lines += ["",
                  "Band = max(2.0, min(1.5 x max seed spread, 3.0)) points. "
                  f"Seeds: {args.seeds}. Generated by "
                  "benchmarks/equivalence_run.py "
                  f"(--recipe {args.recipe}) on {time.strftime('%Y-%m-%d')}."]
        if partial:
            pending = [o for o in objectives if o not in done_objectives]
            lines.append(f"PARTIAL: objectives still running: {pending}.")
        lines.append("")
        with open(args.out, "w") as f:
            f.write("\n".join(lines))
        if not partial:
            print("\n".join(lines))
        return ok

    results = {}
    for i, objective in enumerate(objectives):
        for seed in args.seeds:
            results[(objective, seed)] = {"torch": _one("torch", objective, seed),
                                          "ours": _one("ours", objective, seed)}
        done = objectives[:i + 1]
        if len(done) < len(objectives):  # final emission happens below once
            _write_table(results, done, partial=True)

    ok = _write_table(results, objectives, partial=False)
    print(f"\nwritten: {args.out}")
    print(json.dumps({"equivalent": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
