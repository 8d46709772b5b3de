from deltakd_tpu.models.vit import ViTConfig, ViTOutput, VisionTransformer
from deltakd_tpu.models.registry import MODEL_REGISTRY, get_model_config
from deltakd_tpu.models.factory import (create_model, init_params,
                                        load_teacher_student)

__all__ = ["ViTConfig", "ViTOutput", "VisionTransformer", "MODEL_REGISTRY",
           "get_model_config", "create_model", "init_params",
           "load_teacher_student"]
