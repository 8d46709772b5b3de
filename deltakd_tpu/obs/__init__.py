from deltakd_tpu.obs.logger import get_timestamped_log_file_path, setup_logger
from deltakd_tpu.obs.meters import MetricLogger, SmoothedValue
from deltakd_tpu.obs.profiling import count_params, measure_throughput, model_gflops
from deltakd_tpu.obs.wandb_adapter import WandbRun

__all__ = ["get_timestamped_log_file_path", "setup_logger", "MetricLogger",
           "SmoothedValue", "count_params", "measure_throughput",
           "model_gflops", "WandbRun"]
