"""Production soak: many epochs through run() on the real chip, with a
mid-run interruption + --resume, EMA enabled, checkpointing every epoch.

Extends the TPU-gated 2-epoch smoke (tests/test_learning.py::
test_run_soft_kd_224_smoke_tpu) into stability evidence the short test
can't give: scheduler progression over tens of epochs, EMA long-run, O(1)
epoch metric buffers, per-epoch checkpoint churn (crash-safe fresh-dir
layout), and a real resume that must continue the loss trajectory rather
than restart it. The texture task is learnable, so val top-1 must climb
far above chance by the end.

Usage: python benchmarks/soak_run.py [epochs_total]
       python benchmarks/soak_run.py --analyze <artifact_dir> [epochs_total]
Prints SOAK lines; the final summary is recorded in BASELINE.md.
"""

import os
import re
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_data(root, per_class_train=240, per_class_val=48, hw=256):
    from PIL import Image

    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(hw), np.arange(hw), indexing="ij")
    pats = [(yy // 16) % 2, (xx // 16) % 2, ((yy // 16) + (xx // 16)) % 2,
            np.ones_like(yy)]
    for split, per_class in (("train", per_class_train), ("val", per_class_val)):
        for c in range(4):
            d = os.path.join(root, split, f"class_{c}")
            os.makedirs(d, exist_ok=True)
            for i in range(per_class):
                img = np.clip(pats[c] * 200 + 30
                              + rng.randint(-20, 20, (hw, hw)), 0, 255)
                Image.fromarray(np.stack([img] * 3, -1).astype(np.uint8)).save(
                    os.path.join(d, f"img_{i:04d}.jpg"), quality=90)
    return root


def main(epochs_total=24):
    from deltakd_tpu.configs import parse_args
    from deltakd_tpu.train.loop import run

    base = tempfile.mkdtemp(prefix="deltakd_soak_")
    data = build_data(os.path.join(base, "data"))
    logs = os.path.join(base, "logs")
    ckpt = os.path.join(base, "ckpt")
    split = epochs_total // 2

    common = [
        "--dataset", "imagenet-1k", "--data-path", data,
        "--input-size", "224", "--batch-size", "96",
        "--warmup-epochs", "1", "--lr", "1e-3", "--dtype", "bfloat16",
        "--distillation-type", "soft", "--allow-random-teacher",
        "--student-model", "deit_tiny_distilled_patch16_224",
        "--teacher-model", "deit_small_distilled_patch16_224",
        "--ema-decay", "0.996",
        "--log-file", os.path.join(logs, "soak.log"),
        "--save-dir", ckpt,
    ]

    # The per-iter time/data progress lines go to stdout (MetricLogger's
    # default printer), not the log file — tee them to a file we can parse.
    import contextlib

    class Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)

        def flush(self):
            for st in self.streams:
                st.flush()

    progress_path = os.path.join(base, "progress.txt")

    # Phase 1: epochs [0, split)
    print(f"SOAK phase1: epochs 0..{split - 1}", flush=True)
    with open(progress_path, "a") as pf, \
            contextlib.redirect_stdout(Tee(sys.stdout, pf)):
        run(parse_args(common + ["--epochs", str(split)]))

    # Phase 2: resume from the phase-1 checkpoint, continue to epochs_total.
    # This is the crash-recovery model (SURVEY §5.3): per-epoch ckpt + rerun.
    print(f"SOAK phase2: resume -> epochs {split}..{epochs_total - 1}",
          flush=True)
    with open(progress_path, "a") as pf, \
            contextlib.redirect_stdout(Tee(sys.stdout, pf)):
        run(parse_args(common + ["--epochs", str(epochs_total), "--resume",
                                 "--checkpoint",
                                 os.path.join(ckpt, "checkpoint")]))

    return analyze(base, epochs_total)


def analyze(base, epochs_total=24):
    """Parse + gate the artifacts under `base` (logs/, progress.txt).

    Epoch summaries are read from the timestamped LOG FILES only and the
    per-iter progress lines from the stdout tee only — the logger mirrors
    summaries to stdout, so concatenating both sources double-counts every
    epoch (the bug that failed the first 24-epoch soak's epoch-count gate
    while every substantive gate passed).
    """
    logs = os.path.join(base, "logs")
    progress_path = os.path.join(base, "progress.txt")
    split = epochs_total // 2

    log_text = ""
    for f in sorted(os.listdir(logs)):
        with open(os.path.join(logs, f)) as fh:
            log_text += fh.read()
    with open(progress_path) as fh:
        progress_text = fh.read()
    losses = [float(m)
              for m in re.findall(r"'train_loss': ([0-9.eE+-]+)", log_text)]
    accs = [float(m)
            for m in re.findall(r"'val_acc1': ([0-9.eE+-]+)", log_text)]
    times = [float(m)
             for m in re.findall(r"Epoch \d+ \(([0-9.]+)s\)", log_text)]
    # per-epoch LAST-iter smoothed (time, data) from the train progress lines
    # — separates host/tunnel input stalls from device step time
    iters = {}
    for m in re.finditer(r"Epoch: \[(\d+)/\d+\]\t\[\d+/\d+\].*"
                         r"\ttime: ([0-9.]+)\tdata: ([0-9.]+)", progress_text):
        # progress headers are 1-based ([5/12] belongs to summary "Epoch 4");
        # the resumed phase continues global numbering ([13/24]..), so no
        # cross-phase collision handling is needed.
        iters.setdefault(int(m.group(1)) - 1, []).append(
            (float(m.group(2)), float(m.group(3))))
    n = len(losses)
    ok = True

    def check(cond, msg):
        nonlocal ok
        print(f"SOAK {'ok  ' if cond else 'FAIL'}: {msg}", flush=True)
        ok &= cond

    check(n == epochs_total, f"{n} epochs logged (want {epochs_total})")
    check(losses[-1] < losses[0] * 0.6,
          f"loss descent {losses[0]:.3f} -> {losses[-1]:.3f}")
    # resume continues the trajectory: first resumed epoch must not jump back
    # toward the from-scratch starting loss
    if n == epochs_total:
        check(losses[split] < (losses[0] + losses[split - 1]) / 2,
              f"resume continuity: epoch {split} loss {losses[split]:.3f} "
              f"(epoch0 {losses[0]:.3f}, pre-resume {losses[split - 1]:.3f})")
    # RandAugment's rotations make the two stripe classes equivalent under
    # augmentation, so ~50% val top-1 is this task's ceiling with the full
    # recipe transform on; >=45% means the separable half was learned
    # (chance is 25%). The no-aug learnability tests own the stronger claim.
    check(max(accs[-3:]) >= 45.0, f"val top-1 above chance: last3 {accs[-3:]}")
    # Steady-state epoch time: no retrace/leak creep. Diagnosed bound on
    # this host (see BASELINE.md "soak" entry): late epochs inflate up to
    # ~2x because the async checkpoint's device->host state fetch (~70 MB/
    # epoch) shares the axon tunnel with batch H2D and metric fetches —
    # with checkpointing no-op'd the same 24 epochs hold 4.2-5.6 s flat,
    # and data-wait medians stay flat either way, so it is tunnel
    # contention, not compute/leak creep (PCIe on a real TPU VM makes the
    # fetch ~20 ms). Gate at 2.5x medians: catches genuine leaks/retraces
    # (10x-class) while tolerating the documented contention band.
    def step_med(ep):
        v = [t - d for t, d in iters.get(ep, [])]
        return sorted(v)[len(v) // 2] if v else float("nan")

    early = sorted(times[2:7])[2]
    late = sorted(times[epochs_total - 5:])[2]
    check(late < early * 2.5,
          f"epoch wall time within the tunnel-contention band: "
          f"early median {early:.1f}s vs late median {late:.1f}s")
    print(f"SOAK wall epoch s: {[round(t, 1) for t in times]}", flush=True)
    print(f"SOAK step-data s:  "
          f"{[round(step_med(e), 2) for e in range(epochs_total)]}", flush=True)
    print(f"SOAK data-wait s:  "
          f"{[round(sorted(d for _, d in iters[e])[len(iters[e]) // 2], 2) if e in iters else None for e in range(epochs_total)]}",
          flush=True)
    print(f"SOAK accs:  {[round(a, 1) for a in accs]}", flush=True)
    print(f"SOAK {'PASS' if ok else 'FAIL'}: {epochs_total} epochs "
          f"(EMA on, resume at {split}), final val_acc1 {accs[-1]:.1f}",
          flush=True)
    if ok:
        shutil.rmtree(base, ignore_errors=True)
    else:
        print(f"SOAK artifacts kept at {base}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--analyze":
        sys.exit(analyze(sys.argv[2],
                         int(sys.argv[3]) if len(sys.argv) > 3 else 24))
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 24))
