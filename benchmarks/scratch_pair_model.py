"""Model-level A/B of the block-pair kernel in the full KD train step.

The isolated two-block ablation (scratch_twoblock.py) showed pair fwd+bwd
-10.1% at D=192; the first sequential bench A/B showed the integrated pair
2.4% SLOWER at batch 448. Sequential runs confound with chip throttling
drift (~15% under sustained load, scratch_vpu.py), so this interleaves the
two jitted steps round-robin and reports medians.

Usage: python benchmarks/scratch_pair_model.py [batch] [rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_step(pair: bool, batch_size: int):
    from deltakd_tpu.configs import TrainConfig
    from deltakd_tpu.data.augment import AugmentConfig
    from deltakd_tpu.data.mixup import MixupConfig
    from deltakd_tpu.kd import KDSettings, init_aux_params
    from deltakd_tpu.kd.losses import feature_indices
    from deltakd_tpu.models import create_model, init_params
    from deltakd_tpu.models.registry import get_model_config
    from deltakd_tpu.ops.attention import best_attention_fn
    from deltakd_tpu.ops.fused_block import best_block_fn, best_block_pair_fn
    from deltakd_tpu.ops.fused_mlp import best_mlp_fn
    from deltakd_tpu.train.optim import make_optimizer
    from deltakd_tpu.train.state import TrainState
    from deltakd_tpu.train.step import build_train_step

    cfg = TrainConfig(batch_size=batch_size, distillation_type="soft",
                      dataset="cifar-100", input_size=224, dtype="bfloat16",
                      drop_path_rate=0.1, epochs=300, aug_pixel_bf16=True)
    attn = best_attention_fn(True)
    block_fn = best_block_fn(True)
    depth = get_model_config("deit_tiny_distilled_patch16_224",
                             num_classes=100).depth
    needs = feature_indices("soft", depth)
    student = create_model("deit_tiny_distilled_patch16_224", num_classes=100,
                           img_size=224, drop_path_rate=0.1,
                           dtype=jnp.bfloat16, attention_fn=attn,
                           block_fn=block_fn,
                           block_pair_fn=best_block_pair_fn(pair),
                           collect_features=needs)
    teacher = create_model("deit_small_distilled_patch16_224", num_classes=100,
                           img_size=224, dtype=jnp.bfloat16, attention_fn=attn,
                           mlp_fn=best_mlp_fn(True), block_fn=block_fn,
                           collect_features=needs)
    s_params = init_params(student, jax.random.PRNGKey(1))
    t_params = init_params(teacher, jax.random.PRNGKey(2))
    aux = init_aux_params(jax.random.PRNGKey(3), "soft",
                          student.cfg.embed_dim, teacher.cfg.embed_dim)
    kd = KDSettings.from_config(cfg, student_prefix=2, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 100)
    state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg),
                            mixup=MixupConfig.from_config(cfg, 100), tx=tx)
    return step, state, t_params


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    jax.config.update("jax_default_prng_impl", "rbg")

    host = np.random.RandomState(0)
    images = jnp.asarray(host.randint(0, 256, (B, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(host.randint(0, 100, (B,), dtype=np.int32))
    key = jax.random.PRNGKey(4)
    epoch = jnp.asarray(0, jnp.int32)

    runners = {}
    # hybrid = single-block fwd kernels + fused pair bwd (attribution run);
    # env is read at trace time, so set it around each build+warmup only
    for name, pair, hybrid in (("single", False, False), ("pair", True, False),
                               ("hybrid", True, True)):
        os.environ["DELTAKD_PAIR_HYBRID"] = "1" if hybrid else "0"
        step, state, t_params = build_step(pair, B)
        # warm up / compile
        for _ in range(3):
            state, metrics = step(state, t_params, images, labels, key, epoch)
        float(metrics["train_loss"])
        runners[name] = (step, state, t_params)
        print(f"[{name}] compiled", flush=True)
    os.environ.pop("DELTAKD_PAIR_HYBRID", None)

    # fetch-cost estimate (tunnel scalar fetch ~40 ms, CLAUDE.md)
    t0 = time.perf_counter()
    float(metrics["train_loss"])
    fetch = time.perf_counter() - t0

    times = {k: [] for k in runners}
    steps = 20
    for r in range(rounds):
        for name, (step, state, t_params) in runners.items():
            t0 = time.perf_counter()
            s = state
            for _ in range(steps):
                s, m = step(s, t_params, images, labels, key, epoch)
            float(m["train_loss"])
            dt = (time.perf_counter() - t0 - fetch) / steps
            times[name].append(dt)
            # step donates the state buffers — store the evolved state back
            # or the next round reads deleted arrays
            runners[name] = (step, s, t_params)
            print(f"  round {r} {name:<6} {dt * 1e3:7.2f} ms "
                  f"({B / dt:7.1f} img/s)", flush=True)

    print(f"B={B}:")
    base = float(np.median(times["single"]))
    for name, ts in times.items():
        t = float(np.median(ts))
        note = "" if name == "single" else f" ({(t / base - 1) * 100:+.1f}%)"
        print(f"  {name:<6} median {t * 1e3:7.2f} ms = {B / t:7.1f} img/s{note}")


if __name__ == "__main__":
    main()
