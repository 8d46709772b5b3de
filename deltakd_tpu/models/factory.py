"""Model factory: teacher/student construction + aux-head params.

Functional counterpart of ``load_teacher_student_model``
(reference model/models.py:59-178). The teacher is built frozen (its params
simply never enter the optimizer — no ``requires_grad`` machinery needed in a
functional setting) and optionally initialized from a locally stored timm
state_dict; the student starts from scratch; per-distillation-type aux heads
are returned as a separate parameter collection instead of being grafted onto
the model object.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deltakd_tpu.kd.aux import init_aux_params
from deltakd_tpu.models.import_timm import load_state_dict, timm_to_flax
from deltakd_tpu.models.registry import get_model_config
from deltakd_tpu.models.vit import ViTConfig, VisionTransformer


@dataclasses.dataclass
class ModelBundle:
    """One model = (module, params, static config)."""

    name: str
    cfg: ViTConfig
    module: VisionTransformer
    params: Dict[str, Any]

    def apply(self, params, x, *, train=False, distilled_training=False, rngs=None):
        return self.module.apply({"params": params}, x, train=train,
                                 distilled_training=distilled_training, rngs=rngs)


def create_model(name: str, *, num_classes: int, img_size: int = 224,
                 drop_path_rate: float = 0.0, dtype=jnp.bfloat16,
                 attention_fn: Optional[Callable] = None,
                 mlp_fn: Optional[Callable] = None,
                 block_fn: Optional[Callable] = None,
                 block_pair_fn: Optional[Callable] = None,
                 collect_features: bool = True) -> VisionTransformer:
    cfg = get_model_config(name, num_classes=num_classes, img_size=img_size,
                           drop_path_rate=drop_path_rate)
    return VisionTransformer(cfg, dtype=dtype, attention_fn=attention_fn,
                             mlp_fn=mlp_fn, block_fn=block_fn,
                             block_pair_fn=block_pair_fn,
                             collect_features=collect_features)


def init_params(module: VisionTransformer, rng: jax.Array) -> Dict[str, Any]:
    cfg = module.cfg
    dummy = jnp.zeros((1, cfg.img_size, cfg.img_size, cfg.in_chans), jnp.float32)
    variables = module.init({"params": rng}, dummy, train=False)
    return variables["params"]


def load_teacher_student(config, *, rng: jax.Array,
                         attention_fn: Optional[Callable] = None
                         ) -> Tuple[ModelBundle, ModelBundle, Dict[str, Any]]:
    """Build (teacher, student, aux_params) from a TrainConfig.

    Mirrors reference model/models.py:59-178: teacher gets pretrained weights
    when available (``--teacher-checkpoint`` replaces the timm-hub download,
    with the same reinit-the-head-on-class-mismatch semantics), student trains
    from scratch, and the aux heads depend on the distillation type.
    """
    from deltakd_tpu.data.registry import DATASET_STATS

    num_classes = DATASET_STATS[config.dataset]["num_classes"]
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    k_teacher, k_student, k_aux = jax.random.split(rng, 3)

    # The teacher is forward-only (frozen, reference models.py:70-72), so it
    # can additionally use the fused-MLP inference kernel.
    from deltakd_tpu.kd.losses import feature_indices
    from deltakd_tpu.ops.fused_block import best_block_fn, best_block_pair_fn
    from deltakd_tpu.ops.fused_mlp import best_mlp_fn

    # The fully-fused block kernel carries its own custom_partitioning rule
    # (ops/fused_block.py): the batch dim splits freely over data-parallel
    # mesh axes and backward weight grads are psum'd — so multi-chip DP runs
    # keep the kernel. It is still gated OFF under tensor parallelism (a
    # model axis > 1): the kernel consumes full weight matrices, so the
    # partitioner would all-gather the Megatron-sharded weights every step
    # and silently defeat the TP sharding. TP runs take the unfused module
    # path, which XLA partitions by the parallel/mesh.py rules.
    mesh_shape = getattr(config, "mesh_shape", None)
    model_axis = (int(mesh_shape[1]) if mesh_shape and len(mesh_shape) > 1
                  else 1)
    kernels_on = attention_fn is not None
    block_fn = best_block_fn(kernels_on and model_axis == 1)
    # Block-pair fusion is OFF by default: the isolated two-block ablation
    # won -10% but the FULL-MODEL interleaved A/B measured pair +2.2% / the
    # pair backward alone +1.9% slower at b256 and b448 (negative result,
    # ops/fused_block.py pair section). DELTAKD_PAIR=1 opts the student back
    # in for A/B runs on other hardware.
    pair_enabled = (kernels_on and model_axis == 1
                    and os.environ.get("DELTAKD_PAIR") == "1")
    block_pair_fn = best_block_pair_fn(pair_enabled)

    from deltakd_tpu.models.registry import get_model_config

    def needed_features(model_name: str):
        depth = get_model_config(model_name, num_classes=num_classes,
                                 img_size=config.input_size).depth
        return feature_indices(config.distillation_type, depth)

    teacher_module = create_model(
        config.teacher_model, num_classes=num_classes, img_size=config.input_size,
        drop_path_rate=0.0,  # teacher runs in eval mode; drop-path is inert anyway
        dtype=dtype, attention_fn=attention_fn,
        mlp_fn=best_mlp_fn(kernels_on),
        block_fn=block_fn,
        collect_features=needed_features(config.teacher_model))
    teacher_params = init_params(teacher_module, k_teacher)
    if config.teacher_checkpoint:
        state = load_state_dict(config.teacher_checkpoint)
        teacher_params, report = timm_to_flax(state, teacher_params)
        if report["skipped"]:
            print(f"[teacher import] reinitialized (shape mismatch): {report['skipped']}")
    elif config.distillation_type != "none":
        # The reference guarantees a pretrained teacher (pretrained=True,
        # reference model/models.py:60-63); distilling against a randomly
        # initialized one silently invalidates the whole run.
        if not getattr(config, "allow_random_teacher", False):
            raise ValueError(
                f"--distillation-type {config.distillation_type} requires "
                f"--teacher-checkpoint (the reference always loads pretrained "
                f"teacher weights). Pass --allow-random-teacher to override "
                f"for tests/ablations.")
        print("[teacher] WARNING: distilling against a RANDOMLY INITIALIZED "
              "teacher (--allow-random-teacher); KD signal is noise")

    student_module = create_model(
        config.student_model, num_classes=num_classes, img_size=config.input_size,
        drop_path_rate=config.drop_path_rate, dtype=dtype, attention_fn=attention_fn,
        block_fn=block_fn, block_pair_fn=block_pair_fn,
        collect_features=needed_features(config.student_model))
    student_params = init_params(student_module, k_student)

    aux_params = init_aux_params(
        k_aux, config.distillation_type,
        student_dim=student_module.cfg.embed_dim,
        teacher_dim=teacher_module.cfg.embed_dim,
        lrkd_rank=config.lrkd_rank, saliency_method=config.saliency_method)

    teacher = ModelBundle(config.teacher_model, teacher_module.cfg,
                          teacher_module, teacher_params)
    student = ModelBundle(config.student_model, student_module.cfg,
                          student_module, student_params)
    return teacher, student, aux_params
