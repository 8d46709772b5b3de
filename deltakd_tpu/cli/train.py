"""Training CLI — same flag surface as the reference's tools/train.py.

Usage (mirrors every exp/*.sh recipe; no torchrun — one process drives the
whole TPU mesh):

    python -m deltakd_tpu.cli.train --distillation-type soft \
        --student-model deit_tiny_distilled_patch16_224 \
        --teacher-model deit_small_distilled_patch16_224 \
        --dataset cifar-100 --data-path dataset --epochs 300 ...
"""

import os


def _honor_platform_env() -> None:
    """Apply JAX_PLATFORMS through the config API. On hosts whose
    sitecustomize registers a tunneled TPU platform, the env var alone does
    not switch backends (it is read before the plugin pins its platform);
    the config update must land before the first backend query."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main(argv=None):
    _honor_platform_env()
    from deltakd_tpu.configs import parse_args
    from deltakd_tpu.train.loop import run

    cfg = parse_args(argv)
    from deltakd_tpu.parallel.mesh import is_main_process

    if is_main_process():
        print(cfg)
    return run(cfg)


if __name__ == "__main__":
    main()
