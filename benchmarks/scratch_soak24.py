"""Diagnostic: 24 epochs in ONE process (no resume) — does the epoch-16-21
wall-time inflation seen in the two-phase soak also appear without a resume?
(If yes: cumulative/elapsed-time effect, e.g. tunnel sag under sustained
checkpoint D2H + batch H2D traffic. If no: resume-specific.)"""

import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from soak_run import build_data  # noqa: E402


def main():
    from deltakd_tpu.configs import parse_args
    from deltakd_tpu.train.loop import run

    base = tempfile.mkdtemp(prefix="deltakd_soak24_")
    data = build_data(os.path.join(base, "data"))
    run(parse_args([
        "--dataset", "imagenet-1k", "--data-path", data,
        "--input-size", "224", "--batch-size", "96",
        "--warmup-epochs", "1", "--lr", "1e-3", "--dtype", "bfloat16",
        "--distillation-type", "soft", "--allow-random-teacher",
        "--student-model", "deit_tiny_distilled_patch16_224",
        "--teacher-model", "deit_small_distilled_patch16_224",
        "--ema-decay", "0.996", "--epochs", "24",
        "--log-file", os.path.join(base, "logs", "soak24.log"),
        "--save-dir", os.path.join(base, "ckpt"),
    ]))
    print(f"artifacts: {base}")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
