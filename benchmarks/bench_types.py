"""Per-distillation-type step benchmark (full train step, one chip).

    python benchmarks/bench_types.py [--batch-size 64] [--types soft mgd ...]

Prints one line per type: ms/step and images/sec at steady state. The same
measurement methodology as bench.py (scalar-fetch sync; see CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_type(dtype_name: str, batch_size: int, wasskd_type: str = "l1",
               steps: int = 10, fused: bool = True) -> float:
    from deltakd_tpu.configs import TrainConfig
    from deltakd_tpu.data.augment import AugmentConfig
    from deltakd_tpu.data.mixup import MixupConfig
    from deltakd_tpu.kd import KDSettings, init_aux_params
    from deltakd_tpu.kd.losses import feature_indices
    from deltakd_tpu.models import create_model, init_params
    from deltakd_tpu.ops.attention import best_attention_fn
    from deltakd_tpu.ops.fused_block import best_block_fn
    from deltakd_tpu.ops.fused_mlp import best_mlp_fn
    from deltakd_tpu.train.optim import make_optimizer
    from deltakd_tpu.train.state import TrainState
    from deltakd_tpu.train.step import build_train_step

    cfg = TrainConfig(batch_size=batch_size, distillation_type=dtype_name,
                      dataset="cifar-100", input_size=224, dtype="bfloat16",
                      drop_path_rate=0.1, epochs=300, wasskd_type=wasskd_type)
    from deltakd_tpu.models.registry import get_model_config

    # fused=False measures the unfused-module path — the per-chip cost a user
    # pays under a model (TP) axis, where the kernels auto-gate off
    # (ops/fused_block.py best_block_fn docstring; docs/PARITY.md TP note).
    attn = best_attention_fn(fused)
    block_fn = best_block_fn(fused)
    collect = feature_indices(
        dtype_name, get_model_config("deit_tiny_patch16_224",
                                     num_classes=100).depth)
    student_name = ("deit_tiny_distilled_patch16_224"
                    if dtype_name in ("soft", "hard") else "deit_tiny_patch16_224")
    student = create_model(student_name, num_classes=100, img_size=224,
                           drop_path_rate=0.1, dtype=jnp.bfloat16,
                           attention_fn=attn, block_fn=block_fn,
                           collect_features=collect)
    teacher = create_model("deit_small_distilled_patch16_224", num_classes=100,
                           img_size=224, dtype=jnp.bfloat16, attention_fn=attn,
                           mlp_fn=best_mlp_fn(fused), block_fn=block_fn,
                           collect_features=collect)
    sp = init_params(student, jax.random.PRNGKey(1))
    tp = init_params(teacher, jax.random.PRNGKey(2))
    aux = init_aux_params(jax.random.PRNGKey(3), dtype_name, 192, 384)
    kd = KDSettings.from_config(cfg, student_prefix=student.cfg.num_prefix_tokens,
                                teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": sp, "aux": aux}, 100)
    state = TrainState.create(student_params=sp, aux_params=aux, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg),
                            mixup=MixupConfig.from_config(cfg, 100), tx=tx)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (batch_size, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.randint(0, 100, (batch_size,), dtype=np.int32))
    key = jax.random.PRNGKey(4)
    epoch = jnp.asarray(200, jnp.int32)  # curkd's last phase (heaviest)

    state, m = step(state, tp, imgs, labels, key, epoch)
    float(m["train_loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, tp, imgs, labels, key, epoch)
    float(m["train_loss"])
    ms = (time.perf_counter() - t0) / steps * 1000
    tag = f"{dtype_name}-{wasskd_type}" if dtype_name == "wasskd" else dtype_name
    print(f"{tag}: {ms:.0f} ms/step, {batch_size / ms * 1000:.0f} img/s")
    return ms


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--types", nargs="+", default=[
        "none", "soft", "hard", "mgd", "vitkd", "lrkd", "diffkd", "curkd",
        "saliency_mgd", "wasskd"])
    parser.add_argument("--no-fused", action="store_true",
                        help="unfused module path (the TP-mesh fallback)")
    args = parser.parse_args()
    for t in args.types:
        if t == "wasskd":
            bench_type(t, args.batch_size, "l1", fused=not args.no_fused)
            bench_type(t, args.batch_size, "sinkhorn", fused=not args.no_fused)
        else:
            bench_type(t, args.batch_size, fused=not args.no_fused)


if __name__ == "__main__":
    main()
