from deltakd_tpu.configs.config import (TrainConfig, add_train_args,
                                        config_from_namespace, parse_args)

__all__ = ["TrainConfig", "parse_args", "add_train_args", "config_from_namespace"]
