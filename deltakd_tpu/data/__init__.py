from deltakd_tpu.data.registry import DATASET_STATS
from deltakd_tpu.data.augment import AugmentConfig, eval_transform, train_transform
from deltakd_tpu.data.mixup import MixupConfig, apply_mixup, one_hot_smoothed
from deltakd_tpu.data.pipeline import Loader
from deltakd_tpu.data.sources import build_source, synthetic_source

__all__ = ["DATASET_STATS", "AugmentConfig", "eval_transform", "train_transform",
           "MixupConfig", "apply_mixup", "one_hot_smoothed", "Loader",
           "build_source", "synthetic_source"]
