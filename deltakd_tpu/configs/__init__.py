from deltakd_tpu.configs.config import TrainConfig, parse_args, add_train_args

__all__ = ["TrainConfig", "parse_args", "add_train_args"]
