"""Training subsystem: schedule semantics, one jitted step per KD type,
loss descent, EMA, and checkpoint round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deltakd_tpu.configs import TrainConfig
from deltakd_tpu.data.augment import AugmentConfig
from deltakd_tpu.data.mixup import MixupConfig
from deltakd_tpu.kd import KDSettings, init_aux_params
from deltakd_tpu.models.vit import ViTConfig, VisionTransformer
from deltakd_tpu.train.optim import cosine_epoch_schedule, make_optimizer, wd_mask
from deltakd_tpu.train.state import TrainState
from deltakd_tpu.train.step import build_eval_step, build_train_step

S_DIM, T_DIM = 32, 64
IMG = 32  # 2x2 patch grid


def _tiny_cfg(**kw):
    base = dict(input_size=IMG, batch_size=8, epochs=10, warmup_epochs=2,
                drop_path_rate=0.0, dtype="float32", reprob=0.0,
                aa="", mixup=0.0, cutmix=0.0, dataset="cifar-100",
                ema_decay=None)
    base.update(kw)
    return TrainConfig(**base)


def _models():
    student = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=S_DIM, depth=12, num_heads=2,
                  num_classes=10, distilled=False), dtype=jnp.float32)
    teacher = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=T_DIM, depth=12, num_heads=2,
                  num_classes=10, distilled=True), dtype=jnp.float32)
    s_params = student.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, IMG, IMG, 3)))["params"]
    t_params = teacher.init({"params": jax.random.PRNGKey(1)},
                            jnp.zeros((1, IMG, IMG, 3)))["params"]
    return student, s_params, teacher, t_params


def _batch(seed=0, b=8):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, 256, (b, IMG, IMG, 3)).astype(np.uint8),
            rng.randint(0, 10, (b,)).astype(np.int32))


def test_cosine_schedule_matches_timm_formula():
    cfg = TrainConfig(lr=5e-4, warmup_lr=1e-6, min_lr=1e-5, warmup_epochs=5,
                      epochs=300)
    sched = cosine_epoch_schedule(cfg)
    # warmup endpoints (timm: warmup_lr_init + t*(lr-init)/warmup_t)
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(sched(4)), 1e-6 + 4 * (5e-4 - 1e-6) / 5, rtol=1e-6)
    # post-warmup: timm warmup_prefix=False — cosine at the RAW epoch over
    # [0, t_initial], so epoch 5 sits slightly below base lr
    expected5 = 1e-5 + 0.5 * (5e-4 - 1e-5) * (1 + np.cos(np.pi * 5 / 300))
    np.testing.assert_allclose(float(sched(5)), expected5, rtol=1e-6)
    # exact midpoint of the cycle
    np.testing.assert_allclose(float(sched(150)),
                               1e-5 + 0.5 * (5e-4 - 1e-5), rtol=1e-6)
    # cooldown past one cycle
    np.testing.assert_allclose(float(sched(310)), 1e-5, rtol=1e-6)


def test_fused_adamw_matches_optax_chain():
    """The flat-vector fused update (production path on non-TP meshes) must
    be numerically identical to optax.chain(clip_by_global_norm,
    adamw(mask=wd_mask)) — same moments, same bias correction, same masked
    decay, same clip factor — over a multi-step trajectory."""
    from deltakd_tpu.train.optim import fused_clipped_adamw, make_schedule

    cfg = TrainConfig(lr=3e-3, warmup_lr=1e-6, min_lr=1e-5, warmup_epochs=1,
                      epochs=10, weight_decay=0.05, clip_grad=1.0,
                      opt_eps=1e-8)
    sched = make_schedule(cfg, steps_per_epoch=3)
    params = {
        "student": {
            "pos_embed": jnp.asarray(np.random.RandomState(0).randn(1, 9, 8),
                                     jnp.float32),
            "blocks_0": {
                "attn": {"qkv": {
                    "kernel": jnp.asarray(
                        np.random.RandomState(1).randn(8, 24), jnp.float32),
                    "bias": jnp.zeros((24,), jnp.float32)}},
                "norm1": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
            },
        },
    }
    tx_ref = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=0.05, mask=wd_mask(params)))
    tx_fused = fused_clipped_adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                                   weight_decay=0.05, params=params,
                                   clip_norm=1.0)
    p_ref = p_fused = params
    s_ref, s_fused = tx_ref.init(params), tx_fused.init(params)
    rng = np.random.RandomState(7)
    for i in range(6):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.randn(*p.shape) * 3.0, jnp.float32),
            p_ref)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        u_fused, s_fused = tx_fused.update(grads, s_fused, p_fused)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_fused = optax.apply_updates(p_fused, u_fused)
    for a, b in zip(jax.tree.leaves(p_fused), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_make_optimizer_gates_fused_on_tp_mesh():
    _, s_params, _, _ = _models()
    from deltakd_tpu.train.optim import FusedAdamWState

    cfg_dp = _tiny_cfg()
    tx = make_optimizer(cfg_dp, {"student": s_params, "aux": {}}, 10)
    assert isinstance(tx.init({"student": s_params, "aux": {}}),
                      FusedAdamWState)

    cfg_tp = TrainConfig(**{**cfg_dp.__dict__, "mesh_shape": (1, 2)})
    tx_tp = make_optimizer(cfg_tp, {"student": s_params, "aux": {}}, 10)
    assert not isinstance(tx_tp.init({"student": s_params, "aux": {}}),
                          FusedAdamWState)


def test_wd_mask_excludes_norms_tokens_biases():
    _, s_params, _, _ = _models()
    mask = wd_mask(s_params)
    assert mask["pos_embed"] is False
    assert mask["cls_token"] is False
    assert mask["blocks_0"]["norm1"]["scale"] is False
    assert mask["blocks_0"]["attn"]["qkv"]["bias"] is False
    assert mask["blocks_0"]["attn"]["qkv"]["kernel"] is True
    assert mask["patch_embed"]["kernel"] is True
    # the grafted mask_token (reference model/models.py:84) is ndim 3, not
    # '.bias', and absent from timm's no_weight_decay() → it IS decayed
    assert wd_mask({"mask_token": jnp.zeros((1, 1, 8))})["mask_token"] is True


@pytest.mark.parametrize("dtype_name", ["none", "soft", "hard", "mgd", "vitkd",
                                        "lrkd", "diffkd", "curkd",
                                        "saliency_mgd", "wasskd"])
def test_train_step_runs_all_types(dtype_name):
    cfg = _tiny_cfg(distillation_type=dtype_name)
    if dtype_name in ("soft", "hard"):
        student = VisionTransformer(
            ViTConfig(img_size=IMG, embed_dim=S_DIM, depth=12, num_heads=2,
                      num_classes=10, distilled=True), dtype=jnp.float32)
        s_params = student.init({"params": jax.random.PRNGKey(0)},
                                jnp.zeros((1, IMG, IMG, 3)))["params"]
        _, _, teacher, t_params = _models()
        student_prefix = 2
    else:
        student, s_params, teacher, t_params = _models()
        student_prefix = 1
    aux = init_aux_params(jax.random.PRNGKey(2), dtype_name, S_DIM, T_DIM,
                          lrkd_rank=8)
    kd = KDSettings.from_config(cfg, student_prefix=student_prefix,
                                teacher_prefix=2)
    kd = kd.__class__(**{**kd.__dict__, "lrkd_rank": 8, "sinkhorn_iters": 5})
    tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 10)
    state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg), mixup=None,
                            tx=tx, donate=False)
    images, labels = _batch()
    state2, metrics = step(state, t_params, jnp.asarray(images),
                           jnp.asarray(labels), jax.random.PRNGKey(3),
                           jnp.asarray(0))
    assert np.isfinite(float(metrics["train_loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    assert int(state2.step) == 1
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params, state2.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_train_step_decreases_loss_when_overfitting():
    cfg = _tiny_cfg(distillation_type="none", lr=1e-3, warmup_epochs=0)
    student, s_params, teacher, t_params = _models()
    kd = KDSettings.from_config(cfg, student_prefix=1, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": {}}, 1000)
    state = TrainState.create(student_params=s_params, aux_params={}, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg), mixup=None,
                            tx=tx, donate=False)
    images, labels = _batch()
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    losses = []
    key = jax.random.PRNGKey(4)
    for i in range(12):
        state, metrics = step(state, t_params, images, labels, key, jnp.asarray(0))
        losses.append(float(metrics["train_loss"]))
    # the crop/flip augmentation re-randomizes each step, so this is descent
    # on a noisy objective, not pure memorization — require clear progress
    assert np.mean(losses[-3:]) < losses[0] - 0.15, losses


def test_ema_tracks_params():
    cfg = _tiny_cfg(distillation_type="none", ema_decay=0.5)
    student, s_params, teacher, t_params = _models()
    kd = KDSettings.from_config(cfg, student_prefix=1, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": {}}, 10)
    state = TrainState.create(student_params=s_params, aux_params={}, tx=tx,
                              ema_decay=0.5)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg), mixup=None,
                            tx=tx, donate=False)
    images, labels = _batch()
    state2, _ = step(state, t_params, jnp.asarray(images), jnp.asarray(labels),
                     jax.random.PRNGKey(5), jnp.asarray(0))
    # ema = 0.5·old + 0.5·new exactly
    expected = jax.tree.map(lambda old, new: 0.5 * old + 0.5 * new,
                            state.params, state2.params)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        expected, state2.ema_params)
    assert max(jax.tree.leaves(diff)) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    from deltakd_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint

    cfg = _tiny_cfg()
    _, s_params, _, _ = _models()
    aux = init_aux_params(jax.random.PRNGKey(2), "mgd", S_DIM, T_DIM)
    tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 10)
    state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)

    save_checkpoint(str(tmp_path / "ck"), state, epoch=7, best_acc=55.5,
                    is_best=True)
    target = TrainState.create(
        student_params=jax.tree.map(jnp.zeros_like, s_params),
        aux_params=jax.tree.map(jnp.zeros_like, aux), tx=tx)
    restored, epoch, best = load_checkpoint(str(tmp_path / "ck"), target)
    assert epoch == 7 and best == 55.5
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state.params, restored.params)
    assert max(jax.tree.leaves(diff)) == 0.0
    assert os.path.isdir(str(tmp_path / "ck") + ".best")


def test_finetune_merge_interpolates_and_drops_head(tmp_path):
    from deltakd_tpu.ckpt.checkpoint import save_checkpoint, load_student_for_finetune

    cfg = _tiny_cfg()
    _, s_params, _, _ = _models()
    tx = make_optimizer(cfg, {"student": s_params, "aux": {}}, 10)
    state = TrainState.create(student_params=s_params, aux_params={}, tx=tx)
    save_checkpoint(str(tmp_path / "src"), state, epoch=1, best_acc=0.0,
                    is_best=False)

    # target: different resolution (4x4 grid) and class count
    target_model = VisionTransformer(
        ViTConfig(img_size=64, embed_dim=S_DIM, depth=12, num_heads=2,
                  num_classes=37), dtype=jnp.float32)
    target = target_model.init({"params": jax.random.PRNGKey(9)},
                               jnp.zeros((1, 64, 64, 3)))["params"]
    merged = load_student_for_finetune(str(tmp_path / "src"), target,
                                       num_prefix_tokens=1, log=lambda *_: None)
    assert merged["pos_embed"].shape == (1, 17, S_DIM)
    # head kept at target init (shape mismatch)
    np.testing.assert_array_equal(np.asarray(merged["head"]["kernel"]),
                                  np.asarray(target["head"]["kernel"]))
    # backbone copied
    np.testing.assert_array_equal(
        np.asarray(merged["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(s_params["blocks_0"]["attn"]["qkv"]["kernel"]))


def test_grad_accumulation_matches_large_batch():
    """grad_accum_steps=2 scans two micro-batches, averages their gradients,
    and applies ONE optimizer update (step count +1, finite averaged
    grad-norm, params moved)."""
    cfg = _tiny_cfg(distillation_type="none", warmup_epochs=0)
    student, s_params, teacher, t_params = _models()
    kd = KDSettings.from_config(cfg, student_prefix=1, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": {}}, 10)

    images, labels = _batch()
    images, labels = jnp.asarray(images), jnp.asarray(labels)
    key = jax.random.PRNGKey(11)
    epoch = jnp.asarray(0)

    # accum=2 with the batch duplicated: both micro-batches see identical data
    cfg2 = cfg.replace(grad_accum_steps=2)
    state2 = TrainState.create(student_params=s_params, aux_params={}, tx=tx)
    step2 = build_train_step(cfg=cfg2, kd=kd, student_module=student,
                             teacher_module=teacher,
                             aug=AugmentConfig.from_config(cfg2), mixup=None,
                             tx=tx, donate=False)
    big_images = jnp.concatenate([images, images])
    big_labels = jnp.concatenate([labels, labels])
    out2, m2 = step2(state2, t_params, big_images, big_labels, key, epoch)
    assert np.isfinite(float(m2["train_loss"]))
    assert int(out2.step) == 1
    # params moved and grad_norm is the averaged-micro norm (finite, > 0)
    assert float(m2["grad_norm"]) > 0
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state2.params, out2.params)
    assert max(jax.tree.leaves(delta)) > 0


def test_checkpoint_legacy_layout_still_restores(tmp_path):
    """Round-1 checkpoints (bare state tree + meta.json sidecar) must keep
    restoring after the wrapped {'state','meta'} layout landed; layout
    detection goes through orbax structure metadata, not exception retry."""
    import json

    import orbax.checkpoint as ocp

    from deltakd_tpu.ckpt.checkpoint import load_checkpoint, save_checkpoint

    state = {"w": jnp.arange(5.0), "b": jnp.ones((3,))}
    target = {"w": jnp.zeros(5), "b": jnp.zeros(3)}

    save_checkpoint(str(tmp_path / "new"), state, epoch=7, best_acc=42.5,
                    is_best=False)
    s, ep, best = load_checkpoint(str(tmp_path / "new"), target)
    assert ep == 7 and best == 42.5
    np.testing.assert_allclose(np.asarray(s["w"]), np.arange(5.0))

    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "legacy" / "state"), state)
    ck.wait_until_finished()
    (tmp_path / "legacy" / "meta.json").write_text(
        json.dumps({"epoch": 3, "best_acc": 9.0}))
    s, ep, best = load_checkpoint(str(tmp_path / "legacy"), target)
    assert ep == 3 and best == 9.0
    np.testing.assert_allclose(np.asarray(s["b"]), np.ones(3))


def test_step_schedule_matches_timm_formula():
    """timm StepLRScheduler semantics: warmup then lr·rate^(epoch//decay)."""
    from deltakd_tpu.train.optim import step_epoch_schedule

    cfg = TrainConfig(lr=1e-3, warmup_lr=1e-6, warmup_epochs=2, sched="step",
                      decay_epochs=30, decay_rate=0.1, epochs=100)
    sched = step_epoch_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 1e-6, rtol=1e-6)
    np.testing.assert_allclose(float(sched(1)), 1e-6 + (1e-3 - 1e-6) / 2, rtol=1e-6)
    np.testing.assert_allclose(float(sched(2)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(29)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(30)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(75)), 1e-5, rtol=1e-6)


def test_plateau_controller_matches_torch_reduce_on_plateau():
    """PlateauController is a golden re-derivation of what timm's
    PlateauLRScheduler wraps (torch ReduceLROnPlateau, mode max, rel
    threshold 1e-4) — drive both with the same noisy metric trajectory and
    require identical LR at every epoch (reference create_scheduler surface,
    tools/train.py:54-93)."""
    import torch

    from deltakd_tpu.train.optim import PlateauController

    base_lr, decay, patience, cooldown, min_lr = 1e-3, 0.1, 3, 2, 1e-6
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=decay, patience=patience, cooldown=cooldown,
        threshold=1e-4, threshold_mode="rel", min_lr=min_lr)
    ours = PlateauController(decay_rate=decay, patience=patience,
                             cooldown=cooldown, min_lr=min_lr, base_lr=base_lr)

    rng = np.random.RandomState(0)
    # plateaus interleaved with improvements, enough epochs to hit min_lr
    metric, metrics = 10.0, []
    for e in range(60):
        if e % 13 < 4:
            metric += rng.uniform(0.1, 0.5)  # improving stretch
        metrics.append(metric)
    for e, m in enumerate(metrics):
        ref.step(m)
        scale = ours.epoch_end(m)
        np.testing.assert_allclose(base_lr * scale, opt.param_groups[0]["lr"],
                                   rtol=1e-9, err_msg=f"epoch {e}")
    assert ours.scale < 1.0  # the trajectory actually decayed


def test_lr_scale_helpers_noop_without_scale_state():
    """get/set_lr_scale on an opt state with NO LRScaleState node (cosine
    schedule) must pass ordinary array leaves through untouched — is_leaf
    stops descent at scale nodes but plain leaves still reach the mapped fn
    (regression: run()'s lr-noise path crashed on cosine configs)."""
    from deltakd_tpu.train.optim import get_lr_scale, set_lr_scale

    cfg = TrainConfig(lr=1e-3, warmup_lr=1e-3, warmup_epochs=0,
                      sched="cosine", opt="adamw", clip_grad=None,
                      weight_decay=0.0, epochs=10)
    params = {"student": {"w": jnp.ones((4, 4))}, "aux": {}}
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    st = tx.init(params)
    assert get_lr_scale(st) is None
    st2 = set_lr_scale(st, 0.5)  # no scale node: identity
    a = jax.tree.leaves(st)
    b = jax.tree.leaves(st2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_plateau_optimizer_scale_changes_update_size():
    """--sched plateau: make_optimizer wraps the tx with LRScaleState, and
    set_lr_scale shrinks the applied update by exactly that factor."""
    from deltakd_tpu.train.optim import get_lr_scale, set_lr_scale

    cfg = TrainConfig(lr=1e-3, warmup_lr=1e-3, warmup_epochs=0,
                      sched="plateau", opt="adamw", clip_grad=None,
                      weight_decay=0.0, epochs=10)
    params = {"student": {"w": jnp.ones((4, 4))}, "aux": {}}
    grads = {"student": {"w": jnp.full((4, 4), 0.5)}, "aux": {}}
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    st = tx.init(params)
    assert get_lr_scale(st) == 1.0

    upd_full, _ = tx.update(grads, st, params)
    st_scaled = set_lr_scale(st, 0.1)
    assert get_lr_scale(st_scaled) == pytest.approx(0.1)
    upd_scaled, _ = tx.update(grads, st_scaled, params)
    np.testing.assert_allclose(
        np.asarray(upd_scaled["student"]["w"]),
        0.1 * np.asarray(upd_full["student"]["w"]), rtol=1e-6)


def test_same_epoch_resave_never_deletes_the_only_checkpoint(tmp_path):
    """A same-epoch re-save must not rmtree the only committed checkpoint
    before its replacement commits: the old dir is parked at ``.prev``
    (atomic rename), stays restorable, and is cleaned as superseded by the
    NEXT save (round-3 review finding)."""
    import os

    from deltakd_tpu.ckpt.checkpoint import (_committed_state_dirs,
                                             load_checkpoint, save_checkpoint)

    def simple_state(v):
        return {"w": jnp.full((3,), float(v))}

    d = str(tmp_path / "ck")
    save_checkpoint(d, simple_state(1.0), epoch=5, best_acc=0.0, is_best=False)
    # re-save the SAME epoch with different weights
    save_checkpoint(d, simple_state(2.0), epoch=5, best_acc=0.0, is_best=False)
    # both the fresh dir and the parked .prev are committed checkpoints
    dirs = [os.path.basename(p) for p in _committed_state_dirs(d)]
    assert dirs == ["state-5.prev", "state-5"], dirs
    state, epoch, _ = load_checkpoint(d, simple_state(0.0))
    assert epoch == 5
    np.testing.assert_array_equal(np.asarray(state["w"]), 2.0)
    # the next save cleans everything superseded, keeping its predecessor
    save_checkpoint(d, simple_state(3.0), epoch=6, best_acc=0.0, is_best=False)
    dirs = [os.path.basename(p) for p in _committed_state_dirs(d)]
    assert dirs == ["state-5", "state-6"], dirs


def test_lr_noise_multiplier_timm_semantics():
    """--lr-noise follows timm Scheduler._add_noise: active range is the
    given epoch fractions × epochs, noise is torch.randn from Generator
    seeded seed+epoch, rejection-sampled to |n| < lr_noise_pct, applied as
    lr·(1+n) (reference tools/train.py:71-77)."""
    import torch

    from deltakd_tpu.configs import parse_args
    from deltakd_tpu.train.optim import lr_noise_multiplier

    cfg = parse_args([
        "--dataset", "synthetic", "--synthetic-data", "--epochs", "100",
        "--seed", "42", "--lr-noise", "0.4", "0.8",
        "--student-model", "deit_tiny_patch16_224",
        "--teacher-model", "deit_small_distilled_patch16_224"])
    assert cfg.lr_noise == (0.4, 0.8)

    # outside [40, 80): no noise
    assert lr_noise_multiplier(cfg, 0) == 1.0
    assert lr_noise_multiplier(cfg, 39) == 1.0
    assert lr_noise_multiplier(cfg, 80) == 1.0

    # inside: matches the timm formula exactly (torch RNG ground truth)
    for epoch in (40, 55, 79):
        g = torch.Generator()
        g.manual_seed(cfg.seed + epoch)
        while True:
            expected = torch.randn(1, generator=g).item()
            if abs(expected) < cfg.lr_noise_pct:
                break
        got = lr_noise_multiplier(cfg, epoch)
        assert got == 1.0 + expected
        assert abs(got - 1.0) < cfg.lr_noise_pct
        # deterministic per epoch
        assert lr_noise_multiplier(cfg, epoch) == got

    # single-value form: "from that epoch on"
    cfg1 = cfg.replace(lr_noise=(0.5,))
    assert lr_noise_multiplier(cfg1, 49) == 1.0
    assert lr_noise_multiplier(cfg1, 99) != 1.0


def test_lr_noise_rides_lr_scale_in_optimizer():
    """With --lr-noise the optimizer is wrapped in LRScaleState even for
    non-plateau schedules, so run() can install the per-epoch multiplier."""
    import jax

    from deltakd_tpu.configs import parse_args
    from deltakd_tpu.train.optim import get_lr_scale, make_optimizer, set_lr_scale

    cfg = parse_args([
        "--dataset", "synthetic", "--synthetic-data", "--epochs", "10",
        "--sched", "cosine", "--lr-noise", "0.1",
        "--student-model", "deit_tiny_patch16_224",
        "--teacher-model", "deit_small_distilled_patch16_224"])
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    st = tx.init(params)
    assert get_lr_scale(st) == 1.0
    st = set_lr_scale(st, 1.25)
    grads = jax.tree.map(jnp.ones_like, params)
    upd_scaled, _ = tx.update(grads, st, params)
    upd_base, _ = tx.update(grads, set_lr_scale(st, 1.0), params)
    np.testing.assert_allclose(np.asarray(upd_scaled["w"]),
                               1.25 * np.asarray(upd_base["w"]), rtol=1e-6)
