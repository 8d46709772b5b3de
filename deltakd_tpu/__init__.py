"""deltakd-tpu: a TPU-native knowledge-distillation framework for Vision Transformers.

Built from scratch in JAX/Flax with the capabilities of the DeltaKD reference
(see SURVEY.md): a Flax DeiT model family that exposes per-block MLP
intermediates explicitly, a zoo of nine distillation objectives implemented as
pure functions over (params, features, rng, epoch), an on-device augmentation
pipeline, shard_map/pjit data parallelism over a device mesh, orbax
checkpoint/resume/finetune, and a flag-compatible CLI + recipe surface.
"""

__version__ = "0.1.0"
