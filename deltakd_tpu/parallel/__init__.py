from deltakd_tpu.parallel.mesh import (batch_sharding, is_main_process, make_mesh,
                                       param_shardings, replicated,
                                       state_shardings)

__all__ = ["batch_sharding", "is_main_process", "make_mesh", "param_shardings",
           "replicated", "state_shardings"]
