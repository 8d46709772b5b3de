"""Standalone checkpoint evaluation CLI.

The reference's tools/test.py intends this (load checkpoint → evaluate → dump
JSON next to the checkpoint) but is arity-broken and cannot run (SURVEY.md
bug B2). This is the working rebuild of that intent.

    python -m deltakd_tpu.cli.eval --checkpoint checkpoints/run/checkpoint \
        --dataset cifar-100 --data-path dataset [--use-ema]
"""

import argparse
import json
import os

import jax

from deltakd_tpu.configs import add_train_args, config_from_namespace
from deltakd_tpu.data import AugmentConfig, build_source
from deltakd_tpu.models import load_teacher_student
from deltakd_tpu.parallel.mesh import (batch_sharding, is_main_process,
                                       make_mesh, replicated)
from deltakd_tpu.train.loop import validate
from deltakd_tpu.train.optim import make_optimizer
from deltakd_tpu.train.state import TrainState
from deltakd_tpu.train.step import build_eval_step
from deltakd_tpu.ckpt.checkpoint import load_checkpoint


def main(argv=None):
    from deltakd_tpu.cli.train import _honor_platform_env

    _honor_platform_env()
    parser = argparse.ArgumentParser(description="Evaluate a checkpoint")
    add_train_args(parser)
    parser.add_argument("--use-ema", action="store_true",
                        help="evaluate the EMA weights instead of the raw ones")
    parser.add_argument("--output", type=str, default=None,
                        help="metrics JSON path (default: <checkpoint>.json)")
    ns = parser.parse_args(argv)
    if not ns.checkpoint:
        parser.error("--checkpoint is required")
    cfg = config_from_namespace(ns)

    mesh = make_mesh(cfg.mesh_shape)
    # Evaluation never runs the teacher — the factory is only used to rebuild
    # the student module + aux-param structure for the checkpoint restore, so
    # the pretrained-teacher guard must not fire for KD-typed configs.
    teacher, student, aux = load_teacher_student(
        cfg.replace(allow_random_teacher=True), rng=jax.random.PRNGKey(cfg.seed))
    tx = make_optimizer(cfg, {"student": student.params, "aux": aux}, 1)
    target = TrainState.create(student_params=student.params, aux_params=aux,
                               tx=tx, ema_decay=cfg.ema_decay)
    state, epoch, best = load_checkpoint(cfg.checkpoint, target)
    if ns.use_ema and state.ema_params is not None:
        params = state.ema_params
    else:
        params = state.params
    student_params = jax.device_put(params["student"], replicated(mesh))

    from deltakd_tpu.data.tfdata import make_loader

    val_src = build_source(cfg, is_train=False)
    loader = make_loader(cfg, val_src, batch_size=cfg.batch_size, is_train=False,
                         world=jax.process_count(), rank=jax.process_index(),
                         seed=cfg.seed)
    eval_step = build_eval_step(student_module=student.module,
                                aug=AugmentConfig.from_config(cfg))
    metrics = validate(student_params, eval_step, loader, cfg,
                       batch_shard=batch_sharding(mesh),
                       is_main=is_main_process(), prefix="test")
    metrics["epoch"] = epoch
    print(json.dumps(metrics, indent=4))
    out_path = ns.output or os.path.join(cfg.checkpoint, "eval.json")
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=4)
    return metrics


if __name__ == "__main__":
    main()
