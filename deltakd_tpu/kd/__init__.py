from deltakd_tpu.kd.losses import (ALL_TYPES, FEATURE_TYPES, LOGIT_TYPES,
                                   KDSettings, total_loss)
from deltakd_tpu.kd.aux import init_aux_params

__all__ = ["ALL_TYPES", "FEATURE_TYPES", "LOGIT_TYPES", "KDSettings",
           "total_loss", "init_aux_params"]
