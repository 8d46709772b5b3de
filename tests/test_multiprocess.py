"""Two-process jax.distributed test: the multi-host branches stop being dead code.

Every other test runs single-process, so ``_put_batch``'s
``make_array_from_process_local_data`` branch (train/loop.py), the meter
allgather (obs/meters.py SmoothedValue.synchronize_between_processes), and a
multi-host orbax checkpoint save were never executed in CI. This test spawns
two real ``jax.distributed``-initialized CPU processes (2 local devices each →
a 4-device global mesh) and exercises all three, then restores the multi-host
checkpoint from the parent process.

Reference counterpart: torchrun/NCCL process groups + dist.all_reduce meters +
rank-0 checkpointing (reference tools/utils.py:23-65, logs/logger.py:27-60).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

import jax.numpy as jnp
import numpy as np
from deltakd_tpu.parallel.mesh import batch_sharding, make_mesh
from deltakd_tpu.train.loop import _put_batch

mesh = make_mesh(None)

# 1) global batch assembly from distinct process-local shards
local = np.arange(8, dtype=np.float32).reshape(4, 2) + 100.0 * proc_id
arr = _put_batch(local, batch_sharding(mesh))
assert arr.shape == (8, 2), arr.shape
total = float(jax.jit(jnp.sum)(arr))

# 2) meter synchronization across processes
from deltakd_tpu.obs.meters import SmoothedValue
sv = SmoothedValue()
sv.update(float(proc_id + 1), n=proc_id + 2)   # p0: v=1,n=2  p1: v=2,n=3
sv.synchronize_between_processes()

# 3) multi-host orbax checkpoint save (collective across processes)
from deltakd_tpu.ckpt.checkpoint import save_checkpoint
from jax.sharding import NamedSharding, PartitionSpec
state = {"w": jax.device_put(jnp.arange(6.0),
                             NamedSharding(mesh, PartitionSpec()))}
save_checkpoint(os.path.join(outdir, "ckpt"), state, epoch=3, best_acc=12.5,
                is_best=False)

# 4) the FULL run() driver at mesh (2,2): the model axis spans both
# processes, so the per-epoch best-checkpoint save cannot proc-0-device_get
# the TP-sharded state (non-addressable shards) — it must take the
# collective orbax path (train/loop.py run(), round-2 verdict W7).
from deltakd_tpu.configs import parse_args
from deltakd_tpu.train.loop import run

cfg = parse_args([
    "--dataset", "synthetic", "--synthetic-data", "--input-size", "32",
    "--batch-size", "4", "--epochs", "1", "--steps-per-epoch", "2",
    "--eval-steps", "1", "--warmup-epochs", "0", "--dtype", "float32",
    "--prng-impl", "threefry2x32", "--mesh-shape", "2", "2",
    "--distillation-type", "none", "--allow-random-teacher",
    "--student-model", "deit_tiny_patch16_224",
    "--teacher-model", "deit_small_distilled_patch16_224",
    "--log-file", os.path.join(outdir, "logs", f"mp{proc_id}.log"),
    "--save-dir", os.path.join(outdir, "run_ckpt")])
metrics = run(cfg)

with open(os.path.join(outdir, f"res{proc_id}.json"), "w") as f:
    json.dump({"total": total, "count": sv.count, "sv_total": sv.total,
               "val_loss": metrics["val_loss"],
               "best_val_acc": metrics["best_val_acc"]}, f)
"""


def test_two_process_distributed_batch_meters_checkpoint(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), str(i), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    # generous: the mesh-(2,2) run() compile is slow under full-suite
    # CPU contention (measured 540s+ alongside other tests)
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = [json.load(open(tmp_path / f"res{i}.json")) for i in range(2)]
    # sum over the assembled global batch: (0..7) + (800 + 0..7)
    for r in results:
        assert r["total"] == pytest.approx(28.0 + 828.0)
        assert r["count"] == 5                      # 2 + 3
        assert r["sv_total"] == pytest.approx(1 * 2 + 2 * 3)

    # the multi-host checkpoint is readable by a plain single-process restore
    import jax
    import jax.numpy as jnp

    from deltakd_tpu.ckpt.checkpoint import load_checkpoint

    target = {"w": jnp.zeros((6,))}
    state, epoch, best = load_checkpoint(str(tmp_path / "ckpt"), target)
    np.testing.assert_allclose(np.asarray(state["w"]), np.arange(6.0))
    assert epoch == 3 and best == 12.5

    # run() under the cross-host model axis: both processes agree on the val
    # metrics, and the TP-sharded state committed through the collective save
    assert results[0]["val_loss"] == pytest.approx(results[1]["val_loss"])
    assert np.isfinite(results[0]["val_loss"])
    run_ckpt = tmp_path / "run_ckpt" / "checkpoint"
    assert (run_ckpt / "state-1").is_dir()  # atomic-rename commit completed
    # Structural check via orbax metadata: a raw single-process restore of a
    # 2-process-sharded checkpoint cannot reconstruct the saved shardings,
    # but the tree metadata is device-free.
    tree = ocp_tree_metadata(str(run_ckpt / "state-1"))
    assert "student" in tree["state"]["params"]
    assert "epoch" in tree["meta"]
    meta = json.load(open(run_ckpt / "meta.json"))
    assert meta["epoch"] == 1 and meta["format"] == "wrapped-v1"


def ocp_tree_metadata(path):
    import orbax.checkpoint as ocp

    md = ocp.StandardCheckpointer().metadata(path)
    return getattr(getattr(md, "item_metadata", md), "tree", md)
