"""Component-level timing of the KD train step on the real chip.

Breaks the ~30 ms batch-64 step (docs/ROADMAP.md Performance) into its
pieces — augmentation+mixup, teacher forward, student forward+backward,
optimizer update — so kernel work targets the dominant term instead of a
guess. Timing per CLAUDE.md: run N compiled iterations chained on device,
fetch one scalar to sync (~40 ms tunnel cost, subtracted via a measured
null-fetch), never block_until_ready.

Usage: python benchmarks/bench_components.py [batch ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=30, warmup=3):
    """Median-of-3 of (elapsed - sync_cost)/steps for a compiled fn whose
    output contains at least one scalar-fetchable leaf."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    sync = _fetch(out)
    # measure the bare fetch cost on an already-materialized value
    t0 = time.perf_counter()
    _fetch(out)
    fetch_cost = time.perf_counter() - t0

    results = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _fetch(out)
        results.append((time.perf_counter() - t0 - fetch_cost) / steps)
    return sorted(results)[1]


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)


def main(batches):
    jax.config.update("jax_default_prng_impl", "rbg")
    from deltakd_tpu.configs import TrainConfig
    from deltakd_tpu.data.augment import AugmentConfig, train_transform
    from deltakd_tpu.data.mixup import MixupConfig, apply_mixup
    from deltakd_tpu.kd import KDSettings, init_aux_params
    from deltakd_tpu.models import create_model, init_params
    from deltakd_tpu.ops.attention import best_attention_fn
    from deltakd_tpu.ops.fused_block import best_block_fn
    from deltakd_tpu.ops.fused_mlp import best_mlp_fn, best_train_mlp_fn
    from deltakd_tpu.train.optim import make_optimizer
    from deltakd_tpu.train.state import TrainState
    from deltakd_tpu.train.step import build_train_step

    for batch in batches:
        cfg = TrainConfig(batch_size=batch, distillation_type="soft",
                          dataset="cifar-100", input_size=224, dtype="bfloat16",
                          drop_path_rate=0.1, epochs=300, aug_pixel_bf16=True)
        attn = best_attention_fn(True)
        block_fn = best_block_fn(True)
        student = create_model("deit_tiny_distilled_patch16_224", num_classes=100,
                               img_size=224, drop_path_rate=0.1,
                               dtype=jnp.bfloat16, attention_fn=attn,
                               block_fn=block_fn, collect_features=False)
        teacher = create_model("deit_small_distilled_patch16_224", num_classes=100,
                               img_size=224, dtype=jnp.bfloat16, attention_fn=attn,
                               mlp_fn=best_mlp_fn(True), block_fn=block_fn,
                               collect_features=False)
        s_params = init_params(student, jax.random.PRNGKey(1))
        t_params = init_params(teacher, jax.random.PRNGKey(2))
        aux = init_aux_params(jax.random.PRNGKey(3), "soft",
                              student.cfg.embed_dim, teacher.cfg.embed_dim)
        kd = KDSettings.from_config(cfg, student_prefix=2, teacher_prefix=2)
        tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 100)
        state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)

        aug = AugmentConfig.from_config(cfg)
        mixup = MixupConfig.from_config(cfg, 100)
        host = np.random.RandomState(0)
        images_u8 = jnp.asarray(host.randint(0, 256, (batch, 32, 32, 3), np.uint8))
        labels = jnp.asarray(host.randint(0, 100, (batch,), np.int32))
        key = jax.random.PRNGKey(4)
        epoch = jnp.asarray(0, jnp.int32)

        @jax.jit
        def do_aug(k, imgs, lbls):
            im = train_transform(k, imgs, aug)
            im, tg = apply_mixup(jax.random.fold_in(k, 1), im, lbls, mixup)
            return im.astype(jnp.bfloat16), tg

        images_f, _ = do_aug(key, images_u8, labels)

        @jax.jit
        def teacher_fwd(p, im):
            return teacher.apply({"params": p}, im, train=False).logits

        @jax.jit
        def student_fwd_bwd(p, im, tl):
            def loss_fn(sp):
                out = student.apply({"params": sp}, im, train=True,
                                    distilled_training=True,
                                    rngs={"droppath": jax.random.PRNGKey(0)})
                lp = jax.nn.log_softmax(out.logits_dist / 1.0, -1)
                lt = jax.nn.log_softmax(tl / 1.0, -1)
                kl = jnp.sum(jnp.exp(lt) * (lt - lp)) / lp.shape[0]
                ce = -jnp.mean(jnp.sum(jax.nn.one_hot(labels, 100)
                                       * jax.nn.log_softmax(out.logits), -1))
                return 0.5 * ce + 0.5 * kl
            l, g = jax.value_and_grad(loss_fn)(p)
            return l, g

        t_logits = teacher_fwd(t_params, images_f)
        _, grads = student_fwd_bwd(s_params, images_f, t_logits)

        @jax.jit
        def opt_update(st, g):
            return st.apply_gradients(grads={"student": g, "aux": aux}, tx=tx,
                                      ema_decay=cfg.ema_decay)

        step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                                teacher_module=teacher, aug=aug, mixup=mixup,
                                tx=tx, donate=False)

        rows = {
            "augment+mixup": timeit(do_aug, key, images_u8, labels),
            "teacher_fwd": timeit(teacher_fwd, t_params, images_f),
            "student_fwd_bwd": timeit(student_fwd_bwd, s_params, images_f,
                                      t_logits),
            "opt_update": timeit(opt_update, state, grads),
            "full_step": timeit(lambda: step(state, t_params, images_u8,
                                             labels, key, epoch)[1]),
        }
        print(f"\n=== batch {batch} ===")
        total = 0.0
        for name, t in rows.items():
            if name != "full_step":
                total += t
            print(f"  {name:18s} {t * 1e3:8.2f} ms")
        print(f"  {'sum(parts)':18s} {total * 1e3:8.2f} ms")
        print(f"  full-step img/s: {batch / rows['full_step']:.0f}")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 256])
