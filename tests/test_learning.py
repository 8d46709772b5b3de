"""System-level learnability: the full pipeline (on-device transform → model →
loss → optimizer → eval transform → masked eval) must actually learn a task.

Random-label smoke tests can't catch image/label misalignment or train/eval
transform skew; a crop/flip-invariant texture task can (4 classes:
h-stripes / v-stripes / checkerboard / solid). On TPU the 224px version hits
100% held-out in 120 steps; this CPU-scale version must clearly beat chance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deltakd_tpu.configs import TrainConfig
from deltakd_tpu.data.augment import AugmentConfig
from deltakd_tpu.kd import KDSettings
from deltakd_tpu.models.vit import ViTConfig, VisionTransformer
from deltakd_tpu.train.optim import make_optimizer
from deltakd_tpu.train.state import TrainState
from deltakd_tpu.train.step import build_eval_step, build_train_step

IMG = 32


def _make_data(n, seed):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 4, (n,)).astype(np.int32)
    imgs = np.zeros((n, IMG, IMG, 3), np.uint8)
    yy, xx = np.meshgrid(np.arange(IMG), np.arange(IMG), indexing="ij")
    pats = [(yy // 4) % 2, (xx // 4) % 2, ((yy // 4) + (xx // 4)) % 2,
            np.ones_like(yy)]
    for i in range(n):
        p = pats[labels[i]] * 200 + 30
        base = np.stack([p] * 3, -1)
        imgs[i] = np.clip(base + rng.randint(-20, 20, (IMG, IMG, 3)), 0,
                          255).astype(np.uint8)
    return imgs, labels


def test_pipeline_learns_texture_task():
    B = 32
    cfg = TrainConfig(batch_size=B, distillation_type="none",
                      dataset="cifar-100", input_size=IMG, dtype="float32",
                      drop_path_rate=0.0, epochs=100, lr=2e-3, warmup_epochs=0,
                      reprob=0.0, mixup=0.0, cutmix=0.0, aa="")
    student = VisionTransformer(
        ViTConfig(img_size=IMG, patch_size=4, embed_dim=48, depth=4,
                  num_heads=4, num_classes=4), dtype=jnp.float32)
    teacher = VisionTransformer(
        ViTConfig(img_size=IMG, patch_size=4, embed_dim=48, depth=2,
                  num_heads=4, num_classes=4, distilled=True),
        dtype=jnp.float32)
    sp = student.init({"params": jax.random.PRNGKey(1)},
                      jnp.zeros((1, IMG, IMG, 3)))["params"]
    tp = teacher.init({"params": jax.random.PRNGKey(2)},
                      jnp.zeros((1, IMG, IMG, 3)))["params"]
    kd = KDSettings.from_config(cfg, student_prefix=1, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": sp, "aux": {}}, 1000)
    state = TrainState.create(student_params=sp, aux_params={}, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg), mixup=None,
                            tx=tx, donate=False)
    eval_step = build_eval_step(student_module=student,
                                aug=AugmentConfig.from_config(cfg))

    train_imgs, train_labels = _make_data(512, 0)
    test_imgs, test_labels = _make_data(128, 1)
    key = jax.random.PRNGKey(4)
    epoch = jnp.asarray(0, jnp.int32)
    for i in range(200):
        lo = (i * B) % 512
        idx = np.arange(lo, lo + B) % 512
        state, m = step(state, tp, jnp.asarray(train_imgs[idx]),
                        jnp.asarray(train_labels[idx]), key, epoch)

    sums = None
    for lo in range(0, 128, B):
        out = eval_step(state.params["student"],
                        jnp.asarray(test_imgs[lo:lo + B]),
                        jnp.asarray(test_labels[lo:lo + B]), B)
        sums = out if sums is None else jax.tree.map(jnp.add, sums, out)
    acc = float(sums["correct1"]) / float(sums["count"]) * 100
    assert acc > 50.0, f"held-out acc {acc:.1f}% (chance 25%) — pipeline not learning"
