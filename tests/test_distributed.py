"""Distributed-without-a-cluster: the real sharded train step on the 8-device
CPU mesh must match the single-device run bit-for-bit in expectation
(SURVEY.md §4 point 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from deltakd_tpu.configs import TrainConfig
from deltakd_tpu.data.augment import AugmentConfig
from deltakd_tpu.kd import KDSettings, init_aux_params
from deltakd_tpu.models.vit import ViTConfig, VisionTransformer
from deltakd_tpu.parallel.mesh import (batch_sharding, make_mesh, param_shardings,
                                       replicated)
from deltakd_tpu.train.optim import make_optimizer
from deltakd_tpu.train.state import TrainState
from deltakd_tpu.train.step import build_train_step

IMG = 32


def _setup(distillation_type="soft"):
    cfg = TrainConfig(input_size=IMG, batch_size=16, epochs=10, warmup_epochs=2,
                      drop_path_rate=0.0, dtype="float32", reprob=0.0, aa="",
                      mixup=0.0, cutmix=0.0, dataset="cifar-100",
                      distillation_type=distillation_type)
    student = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=32, depth=12, num_heads=2,
                  num_classes=10, distilled=True), dtype=jnp.float32)
    teacher = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=64, depth=12, num_heads=2,
                  num_classes=10, distilled=True), dtype=jnp.float32)
    s_params = student.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, IMG, IMG, 3)))["params"]
    t_params = teacher.init({"params": jax.random.PRNGKey(1)},
                            jnp.zeros((1, IMG, IMG, 3)))["params"]
    aux = init_aux_params(jax.random.PRNGKey(2), distillation_type, 32, 64)
    kd = KDSettings.from_config(cfg, student_prefix=2, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 10)
    state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg), mixup=None,
                            tx=tx, donate=False)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (16, IMG, IMG, 3)).astype(np.uint8)
    labels = rng.randint(0, 10, (16,)).astype(np.int32)
    return step, state, t_params, images, labels


def test_eight_fake_devices_available():
    assert len(jax.devices()) == 8, (
        "conftest must set xla_force_host_platform_device_count=8")


def test_sharded_step_matches_single_device():
    step, state, t_params, images, labels = _setup()
    key = jax.random.PRNGKey(7)
    epoch = jnp.asarray(0)

    # single device
    state_1, metrics_1 = step(state, t_params, jnp.asarray(images),
                              jnp.asarray(labels), key, epoch)

    # 8-device data-parallel: batch sharded, params replicated
    mesh = make_mesh((8, 1))
    repl = replicated(mesh)
    shard = batch_sharding(mesh)
    state_r = jax.device_put(state, repl)
    t_r = jax.device_put(t_params, repl)
    state_8, metrics_8 = step(state_r, t_r, jax.device_put(jnp.asarray(images), shard),
                              jax.device_put(jnp.asarray(labels), shard), key, epoch)

    np.testing.assert_allclose(float(metrics_1["train_loss"]),
                               float(metrics_8["train_loss"]), rtol=1e-5)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        jax.device_get(state_1.params),
                        jax.device_get(state_8.params))
    assert max(jax.tree.leaves(diff)) < 1e-5


def test_tensor_parallel_shardings_compile_and_match():
    """(data=2, model=4) mesh: TP rules shard QKV/MLP kernels; results match
    the single-device step."""
    step, state, t_params, images, labels = _setup()
    key = jax.random.PRNGKey(7)
    epoch = jnp.asarray(0)
    state_1, metrics_1 = step(state, t_params, jnp.asarray(images),
                              jnp.asarray(labels), key, epoch)

    mesh = make_mesh((2, 4))
    shard = batch_sharding(mesh)
    state_tp = jax.device_put(state, param_shardings(mesh, state))
    t_tp = jax.device_put(t_params, param_shardings(mesh, t_params))
    state_2, metrics_2 = step(state_tp, t_tp,
                              jax.device_put(jnp.asarray(images), shard),
                              jax.device_put(jnp.asarray(labels), shard),
                              key, epoch)
    np.testing.assert_allclose(float(metrics_1["train_loss"]),
                               float(metrics_2["train_loss"]), rtol=1e-4)
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        jax.device_get(state_1.params),
                        jax.device_get(state_2.params))
    assert max(jax.tree.leaves(diff)) < 1e-4


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh((4, 2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_grad_accumulation_under_mesh():
    """grad_accum_steps composes with dp×tp sharding (scan over micro-batches
    of a sharded global batch)."""
    step, state, t_params, images, labels = _setup("mgd")
    # rebuild the step with accumulation
    from deltakd_tpu.configs import TrainConfig
    from deltakd_tpu.data.augment import AugmentConfig
    from deltakd_tpu.kd import KDSettings, init_aux_params
    from deltakd_tpu.models.vit import ViTConfig, VisionTransformer

    cfg = TrainConfig(input_size=IMG, batch_size=8, epochs=10, warmup_epochs=2,
                      drop_path_rate=0.0, dtype="float32", reprob=0.0, aa="",
                      mixup=0.0, cutmix=0.0, dataset="cifar-100",
                      distillation_type="mgd", grad_accum_steps=2)
    student = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=32, depth=12, num_heads=2,
                  num_classes=10, distilled=True), dtype=jnp.float32)
    teacher = VisionTransformer(
        ViTConfig(img_size=IMG, embed_dim=64, depth=12, num_heads=2,
                  num_classes=10, distilled=True), dtype=jnp.float32)
    kd = KDSettings.from_config(cfg, student_prefix=2, teacher_prefix=2)
    from deltakd_tpu.train.optim import make_optimizer
    from deltakd_tpu.train.state import TrainState
    from deltakd_tpu.train.step import build_train_step

    aux = init_aux_params(jax.random.PRNGKey(2), "mgd", 32, 64)
    tx = make_optimizer(cfg, {"student": state.params["student"], "aux": aux}, 10)
    st = TrainState.create(student_params=state.params["student"],
                           aux_params=aux, tx=tx)
    step_a = build_train_step(cfg=cfg, kd=kd, student_module=student,
                              teacher_module=teacher,
                              aug=AugmentConfig.from_config(cfg), mixup=None,
                              tx=tx, donate=False)
    mesh = make_mesh((4, 2))
    shard = batch_sharding(mesh)
    st = jax.device_put(st, param_shardings(mesh, st))
    t_p = jax.device_put(t_params, param_shardings(mesh, t_params))
    out, metrics = step_a(st, t_p, jax.device_put(jnp.asarray(images), shard),
                          jax.device_put(jnp.asarray(labels), shard),
                          jax.random.PRNGKey(0), jnp.asarray(0))
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(jax.device_get(out.step)) == 1
