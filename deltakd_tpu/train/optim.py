"""Optimizer + LR schedule with timm-compatible semantics.

The reference calls timm's ``create_optimizer``/``create_scheduler``
(reference tools/train.py:264-265) with AdamW + per-epoch cosine. Parity
points reproduced here:

* weight decay is masked off for 1-D params (biases, LayerNorm) and for the
  ViT no-decay set {pos_embed, cls_token, dist_token} — timm 0.9.12's
  ``param_groups_weight_decay`` rule (``ndim <= 1 or name.endswith('.bias')
  or name in model.no_weight_decay()``). The grafted ``mask_token``
  (reference model/models.py:84, ndim 3, absent from timm's no-decay set)
  therefore *does* receive weight decay, matching the reference;
* the cosine schedule steps per *epoch* (``scheduler.step(epoch)``,
  reference train.py:333): linear warmup from ``warmup_lr`` over
  ``warmup_epochs``, then ``min_lr + ½(lr−min_lr)(1+cos(π·t/T))`` with
  ``T = epochs`` (timm CosineLRScheduler, cycle_limit=1), clamping to
  ``min_lr`` beyond one cycle (the cooldown phase);
* gradient clipping by global norm when ``--clip-grad`` is set
  (timm NativeScaler's clip step, reference engine.py:61).

The schedule is evaluated *inside* the jitted step from the optax step count
(``steps_per_epoch`` is static), so per-epoch LR changes never retrigger
compilation.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

NO_DECAY_NAMES = ("bias", "scale", "pos_embed", "cls_token", "dist_token")


def wd_mask(params) -> Any:
    """True where weight decay applies (timm: ndim > 1 and not in no_decay)."""

    def decay(path, leaf):
        names = [getattr(p, "key", getattr(p, "idx", "")) for p in path]
        if any(str(n) in NO_DECAY_NAMES for n in names):
            return False
        return jnp.ndim(leaf) > 1

    return jax.tree_util.tree_map_with_path(decay, params)


def cosine_epoch_schedule(cfg) -> Callable[[jax.Array], jax.Array]:
    """timm CosineLRScheduler(t_initial=epochs, warmup_t, warmup_lr_init,
    lr_min, cycle_limit=1) evaluated at integer epochs.

    timm's default is warmup_prefix=False: after warmup the cosine is
    evaluated at the *raw* epoch over [0, t_initial] (the warmup carves into
    the cycle rather than shifting it), and epochs ≥ t_initial sit at lr_min.
    """
    base, warm0, lr_min = cfg.lr, cfg.warmup_lr, cfg.min_lr
    warmup_t, t_initial = cfg.warmup_epochs, cfg.epochs

    def lr_at_epoch(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = warm0 + epoch * (base - warm0) / max(warmup_t, 1)
        t = jnp.clip(epoch, 0.0, float(t_initial))
        cos = lr_min + 0.5 * (base - lr_min) * (1.0 + jnp.cos(math.pi * t / t_initial))
        lr = jnp.where(epoch < warmup_t, warm, cos)
        return jnp.where(epoch >= t_initial, lr_min, lr)

    return lr_at_epoch


def step_epoch_schedule(cfg) -> Callable[[jax.Array], jax.Array]:
    """timm StepLRScheduler: lr·decay_rate^(epoch // decay_epochs) after the
    same linear warmup (reference create_scheduler surface, train.py:54-93)."""
    base, warm0 = cfg.lr, cfg.warmup_lr
    warmup_t, decay_t, decay_rate = cfg.warmup_epochs, cfg.decay_epochs, cfg.decay_rate

    def lr_at_epoch(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = warm0 + epoch * (base - warm0) / max(warmup_t, 1)
        stepped = base * jnp.power(decay_rate, jnp.floor(epoch / decay_t))
        return jnp.where(epoch < warmup_t, warm, stepped)

    return lr_at_epoch


def make_schedule(cfg, steps_per_epoch: int) -> Callable[[jax.Array], jax.Array]:
    if cfg.sched == "cosine":
        per_epoch = cosine_epoch_schedule(cfg)
    elif cfg.sched == "step":
        per_epoch = step_epoch_schedule(cfg)
    else:
        # plateau needs val-metric feedback inside the schedule — reject
        # loudly rather than silently train a different recipe
        raise NotImplementedError(
            f"scheduler '{cfg.sched}' not implemented (cosine and step are; "
            f"reference default is cosine, train.py:69-70)")

    def sched(step):
        return per_epoch(jnp.asarray(step) // steps_per_epoch)

    return sched


def make_optimizer(cfg, params, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.clip_grad is not None:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    betas = cfg.opt_betas or (0.9, 0.999)
    if cfg.opt == "adamw":
        chain.append(optax.adamw(
            learning_rate=sched, b1=betas[0], b2=betas[1], eps=cfg.opt_eps,
            weight_decay=cfg.weight_decay, mask=wd_mask(params)))
    elif cfg.opt in ("sgd", "momentum"):
        chain.append(optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask(params)),
            optax.sgd(learning_rate=sched, momentum=cfg.momentum, nesterov=True)))
    elif cfg.opt == "adam":
        chain.append(optax.adam(learning_rate=sched, b1=betas[0], b2=betas[1],
                                eps=cfg.opt_eps))
    else:
        raise NotImplementedError(f"optimizer '{cfg.opt}' not implemented")
    return optax.chain(*chain)
