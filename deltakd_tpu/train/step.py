"""The jitted train/eval steps — the framework's hot path.

One compiled function per (distillation type) fuses everything the reference
spreads across DataLoader workers, autocast regions and DDP hooks
(reference tools/engine.py:8-76): on-device augmentation + mixup, the frozen
teacher forward (no_grad falls out of functional purity — the teacher params
simply aren't differentiated), the student forward with explicit
intermediates, the KD loss, backward, clip, AdamW update, EMA, and the metric
reductions. Under a device mesh the batch is sharded on the ``data`` axis and
XLA inserts the gradient all-reduce over ICI — the DDP/NCCL replacement
(SURVEY.md §5.8).

Per step this runs the same three transformer passes as the reference
(student fwd+bwd, teacher fwd, SURVEY.md §3.2) but in one XLA program with
bf16 compute and no host round-trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from deltakd_tpu.data.augment import AugmentConfig, eval_transform, train_transform
from deltakd_tpu.data.mixup import MixupConfig, apply_mixup
from deltakd_tpu.kd.losses import (FEATURE_TYPES, LOGIT_TYPES, KDSettings,
                                   cross_entropy, total_loss)
from deltakd_tpu.train.state import TrainState


def topk_correct(logits: jax.Array, labels: jax.Array, k: int) -> jax.Array:
    """Per-sample boolean: label within the top-k logits (k clamped to the
    class count so top-5 metrics work on <5-way problems)."""
    _, topk = jax.lax.top_k(logits, min(k, logits.shape[-1]))
    return jnp.any(topk == labels[:, None], axis=-1)


def build_train_step(*, cfg, kd: KDSettings, student_module, teacher_module,
                     aug: AugmentConfig, mixup: Optional[MixupConfig], tx,
                     donate: bool = True, batch_shard=None) -> Callable:
    """Returns jitted ``step(state, teacher_params, images_u8, labels, key,
    epoch) -> (state, metrics)``.

    ``batch_shard`` (a NamedSharding over the data axis) pins the grad-accum
    micro-batch layout: the [accum·mb] → [accum, mb] reshape otherwise lets
    GSPMD propose a superdim-split tiling for the scanned operands that the
    custom_partitioning importer cannot parse (explode_superdims assert) when
    the fused block kernel sits inside the scan.
    """
    needs_teacher = kd.distillation_type != "none"
    needs_features = kd.distillation_type in FEATURE_TYPES
    distilled_training = (kd.distillation_type in LOGIT_TYPES
                          and student_module.cfg.distilled)
    ema_decay = cfg.ema_decay
    accum = max(1, getattr(cfg, "grad_accum_steps", 1))

    def micro_grads(params, teacher_params, micro_key, images_u8, labels,
                    epoch):
        """Loss/grads/metrics for one micro-batch."""
        k_aug, k_mix, k_loss, k_droppath, k_dropout = jax.random.split(
            micro_key, 5)
        images = train_transform(k_aug, images_u8, aug)
        if mixup is not None:
            images, targets = apply_mixup(k_mix, images, labels, mixup)
        else:
            targets = labels
        images = images.astype(student_module.dtype)

        if needs_teacher:
            t_out = teacher_module.apply({"params": teacher_params}, images,
                                         train=False)
            teacher_logits = t_out.logits
            teacher_feats = t_out.features if needs_features else None
        else:
            teacher_logits = teacher_feats = None

        def loss_fn(params):
            s_out = student_module.apply(
                {"params": params["student"]}, images, train=True,
                distilled_training=distilled_training,
                rngs={"droppath": k_droppath, "dropout": k_dropout})
            loss, metrics = total_loss(
                kd, student_logits=s_out.logits,
                student_dist_logits=s_out.logits_dist,
                student_feats=s_out.features if needs_features else None,
                teacher_logits=teacher_logits, teacher_feats=teacher_feats,
                aux_params=params["aux"], targets=targets, rng=k_loss,
                epoch=epoch, train=True)
            return loss, (metrics, s_out.logits)

        (loss, (loss_metrics, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        metrics = {
            "train_loss": loss,
            # accuracy against the un-mixed labels (reference engine.py:53-56)
            "train_acc1": jnp.mean(topk_correct(logits, labels, 1) * 100.0),
            "train_acc5": jnp.mean(topk_correct(logits, labels, 5) * 100.0),
            **{k: v for k, v in loss_metrics.items()},
        }
        return grads, metrics

    def step(state: TrainState, teacher_params, images_u8, labels, key, epoch):
        key = jax.random.fold_in(key, state.step)

        if accum == 1:
            grads, metrics = micro_grads(state.params, teacher_params, key,
                                         images_u8, labels, epoch)
        else:
            # global batch = accum × micro-batch, averaged like one big batch
            mb = images_u8.shape[0] // accum
            imgs_m = images_u8.reshape(accum, mb, *images_u8.shape[1:])
            labels_m = labels.reshape(accum, mb)
            if batch_shard is not None:
                from jax.sharding import NamedSharding, PartitionSpec
                micro = NamedSharding(
                    batch_shard.mesh,
                    PartitionSpec(None, *batch_shard.spec))
                imgs_m = jax.lax.with_sharding_constraint(imgs_m, micro)
                labels_m = jax.lax.with_sharding_constraint(labels_m, micro)

            def body(carry, xs):
                i, im, lb = xs
                g, m = micro_grads(state.params, teacher_params,
                                   jax.random.fold_in(key, i), im, lb, epoch)
                g_acc, m_acc = carry
                return (jax.tree.map(jnp.add, g_acc, g),
                        jax.tree.map(jnp.add, m_acc, m)), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            # derive the metrics carry structure from micro_grads itself
            # (eval_shape = trace only, no FLOPs) so a loss that adds a
            # metrics key cannot desync the scan carry (round-3 verdict W7)
            _, m_shapes = jax.eval_shape(
                micro_grads, state.params, teacher_params, key,
                imgs_m[0], labels_m[0], epoch)
            zeros_m = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), m_shapes)
            (g_sum, m_sum), _ = jax.lax.scan(
                body, (zeros_g, zeros_m),
                (jnp.arange(accum), imgs_m, labels_m))
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            metrics = jax.tree.map(lambda m: m / accum, m_sum)

        new_state = state.apply_gradients(grads=grads, tx=tx, ema_decay=ema_decay)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if (donate and cfg.donate_state) else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def build_eval_step(*, student_module, aug: AugmentConfig) -> Callable:
    """Returns jitted ``eval_step(params, images_u8, labels, valid) ->
    sums dict`` — masked sums so padded tail batches don't skew metrics
    (the reference averages over DistributedSampler padding; we mask exactly).

    ``valid`` is a per-sample bool/float mask sharded like the batch. Under
    multi-host execution each process marks its *own* tail padding, which a
    scalar count compared against global row indices cannot express (the
    global batch interleaves per-host shards). A scalar is still accepted for
    single-process callers and means "first n_valid rows"."""

    def step(student_params, images_u8, labels, valid):
        images = eval_transform(images_u8, aug).astype(student_module.dtype)
        out = student_module.apply({"params": student_params}, images, train=False)
        logits = out.logits
        if jnp.ndim(valid) == 0:
            valid = jnp.arange(labels.shape[0]) < valid
        valid = valid.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return {
            "loss_sum": jnp.sum(nll * valid),
            "correct1": jnp.sum(topk_correct(logits, labels, 1) * valid),
            "correct5": jnp.sum(topk_correct(logits, labels, 5) * valid),
            "count": jnp.sum(valid),
        }

    return jax.jit(step)
