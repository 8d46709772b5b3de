from deltakd_tpu.ckpt.checkpoint import (load_checkpoint,
                                         load_student_for_finetune,
                                         save_checkpoint)

__all__ = ["load_checkpoint", "load_student_for_finetune", "save_checkpoint"]
