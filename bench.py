"""Headline benchmark: images/sec/chip for the full DeiT-Tiny KD train step.

Measures the production hot path end-to-end on one chip — on-device
augmentation + mixup, frozen DeiT-Small-distilled teacher forward, DeiT-Tiny
student forward/backward, AdamW update — i.e. the same three transformer
passes per step as the reference's measured workload (SURVEY.md §3.2,
BASELINE.md north star).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so R is
measured against an estimated A100 DDP throughput for the same workload.
Derivation: public timm A100 AMP benchmarks put DeiT-Tiny train (fwd+bwd) at
~2800 img/s and DeiT-Small inference at ~5000 img/s; run serially per KD step
that's 1/(1/2800 + 1/5000) ≈ 1795 img/s, before host dataloader and KD-loss
overheads. We use 1800 img/s/GPU as the A100 reference point. R > 1 beats it.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_DDP_ESTIMATE_IMG_PER_SEC = 1800.0


def main(batch_size: int = 448, steps: int = 40, warmup: int = 3,
         distillation_type: str = "soft", e2e: bool = True):
    """Per-chip batch is nearly free with the fused block kernel + subset-
    gated augmentation, and with the round-3 tb-chain kernel it keeps
    climbing gently to a plateau (round-3 scan: 128→3912, 192→3920-3940,
    224→3997, 256→3990, 320→4057-4072, 384→4077-4088, 448→4127, 512→4115
    img/s; round 2 was flat ~3500 over 96-256, round 1 peaked at batch 48
    with 2353); the global batch of a recipe comes from the data-parallel
    axis and --grad-accum-steps, so per-chip batch is a free throughput
    knob — 448 is the scanned optimum."""
    jax.config.update("jax_default_prng_impl", "rbg")
    from deltakd_tpu.configs import TrainConfig
    from deltakd_tpu.data.augment import AugmentConfig
    from deltakd_tpu.data.mixup import MixupConfig
    from deltakd_tpu.kd import KDSettings, init_aux_params
    from deltakd_tpu.models import create_model, init_params
    from deltakd_tpu.train.optim import make_optimizer
    from deltakd_tpu.train.state import TrainState
    from deltakd_tpu.train.step import build_train_step

    from deltakd_tpu.kd.losses import feature_indices
    from deltakd_tpu.ops.attention import best_attention_fn
    from deltakd_tpu.ops.fused_block import best_block_fn, best_block_pair_fn
    from deltakd_tpu.ops.fused_mlp import best_mlp_fn

    cfg = TrainConfig(batch_size=batch_size, distillation_type=distillation_type,
                      dataset="cifar-100", input_size=224, dtype="bfloat16",
                      drop_path_rate=0.1, epochs=300, aug_pixel_bf16=True)
    from deltakd_tpu.models.registry import get_model_config

    attn = best_attention_fn(True)
    block_fn = best_block_fn(True)
    depth = get_model_config("deit_tiny_distilled_patch16_224",
                             num_classes=100).depth
    needs_features = feature_indices(distillation_type, depth)
    rng = jax.random.PRNGKey(0)
    # block-pair fusion measured SLOWER at model level (+2.2%, negative
    # result in ops/fused_block.py) — off unless DELTAKD_PAIR=1 opts in
    pair_fn = best_block_pair_fn(os.environ.get("DELTAKD_PAIR") == "1")
    student = create_model("deit_tiny_distilled_patch16_224", num_classes=100,
                           img_size=224, drop_path_rate=0.1, dtype=jnp.bfloat16,
                           attention_fn=attn, block_fn=block_fn,
                           block_pair_fn=pair_fn,
                           collect_features=needs_features)
    teacher = create_model("deit_small_distilled_patch16_224", num_classes=100,
                           img_size=224, dtype=jnp.bfloat16, attention_fn=attn,
                           mlp_fn=best_mlp_fn(True), block_fn=block_fn,
                           collect_features=needs_features)
    s_params = init_params(student, jax.random.PRNGKey(1))
    t_params = init_params(teacher, jax.random.PRNGKey(2))
    aux = init_aux_params(jax.random.PRNGKey(3), distillation_type,
                          student.cfg.embed_dim, teacher.cfg.embed_dim)

    kd = KDSettings.from_config(cfg, student_prefix=2, teacher_prefix=2)
    tx = make_optimizer(cfg, {"student": s_params, "aux": aux}, 100)
    state = TrainState.create(student_params=s_params, aux_params=aux, tx=tx)
    step = build_train_step(cfg=cfg, kd=kd, student_module=student,
                            teacher_module=teacher,
                            aug=AugmentConfig.from_config(cfg),
                            mixup=MixupConfig.from_config(cfg, 100), tx=tx)

    host_rng = np.random.RandomState(0)
    images = jnp.asarray(host_rng.randint(0, 256, (batch_size, 32, 32, 3),
                                          dtype=np.uint8))
    labels = jnp.asarray(host_rng.randint(0, 100, (batch_size,), dtype=np.int32))
    key = jax.random.PRNGKey(4)
    epoch = jnp.asarray(0, jnp.int32)

    for _ in range(warmup):
        state, metrics = step(state, t_params, images, labels, key, epoch)
    float(metrics["train_loss"])  # host fetch = reliable sync (tunnel-safe)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, t_params, images, labels, key, epoch)
    float(metrics["train_loss"])
    elapsed = time.perf_counter() - t0

    img_per_sec = batch_size * steps / elapsed
    n_chips = len(jax.devices())
    per_chip = img_per_sec / n_chips

    e2e_rate = e2e_tf_rate = h2d_cap = loader_pil = loader_tf = None
    if e2e:
        try:
            e2e_rate = e2e_images_per_sec(step, state, t_params, key)
        except Exception as exc:  # the headline must survive a broken host path
            print(f"[bench] e2e loader benchmark failed: {exc}")
        try:
            e2e_tf_rate = e2e_images_per_sec(step, state, t_params, key,
                                             loader_kind="tfdata")
        except Exception as exc:
            print(f"[bench] e2e tfdata benchmark failed: {exc}")
        try:
            h2d_cap = h2d_cap_images_per_sec()
        except Exception as exc:
            print(f"[bench] h2d cap benchmark failed: {exc}")
        try:
            loader_pil = loader_only_images_per_sec("pil")
            loader_tf = loader_only_images_per_sec("tfdata")
        except Exception as exc:
            print(f"[bench] loader-only benchmark failed: {exc}")

    gflops_per_img = kd_step_gflops_per_image()
    tflops = per_chip * gflops_per_img / 1e3
    peak = _peak_bf16_tflops()
    print(json.dumps({
        "metric": "deit_tiny_kd_train_step_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / A100_DDP_ESTIMATE_IMG_PER_SEC, 3),
        # loader-driven numbers: real FolderSource JPEG decode + host batching
        # + H2D at the recipe batch 256, synthetic image files, on this host's
        # single shared CPU core — pil = thread-pool PIL decode, tfdata = the
        # engineered tf.data C++ pipeline (--data-loader tfdata). On THIS host
        # both are capped by the axon tunnel's H2D bandwidth (~20-60 MB/s =
        # h2d_tunnel_cap below), not by the loaders: the loader_only_* drains
        # show the framework's actual host-pipeline rates on this 1-vCPU box.
        "e2e_loader_img_per_sec": None if e2e_rate is None else round(e2e_rate, 1),
        "e2e_tfdata_img_per_sec": (None if e2e_tf_rate is None
                                   else round(e2e_tf_rate, 1)),
        "h2d_tunnel_cap_img_per_sec": (None if h2d_cap is None
                                       else round(h2d_cap, 1)),
        "loader_only_pil_img_per_sec": (None if loader_pil is None
                                        else round(loader_pil, 1)),
        "loader_only_tfdata_img_per_sec": (None if loader_tf is None
                                           else round(loader_tf, 1)),
        "model_tflops_per_sec": round(tflops, 1),
        "mfu": None if peak is None else round(tflops / peak, 3),
    }))
    return per_chip


def kd_step_gflops_per_image() -> float:
    """Model matmul FLOPs per image for the KD step: one DeiT-Small teacher
    forward + 3x DeiT-Tiny student forward (fwd+bwd = 3x fwd convention)."""

    def vit_fwd_gflops(D, depth=12, n_patch=196, prefix=2, patch=16):
        n = n_patch + prefix
        embed = 2 * n_patch * D * 3 * patch * patch
        blocks = depth * (24 * n * D * D + 4 * n * n * D)
        return (embed + blocks) / 1e9

    return vit_fwd_gflops(384) + 3 * vit_fwd_gflops(192)


def _peak_bf16_tflops():
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in (("v5 lite", 197.0), ("v5e", 197.0), ("v5p", 459.0),
                      ("v4", 275.0), ("v6", 918.0)):
        if key in kind:
            return peak
    return None


def _synthetic_imagefolder(root: str, classes: int = 64,
                           per_class: int = 48, hw: int = 256) -> str:
    """Create (once) a JPEG ImageFolder tree of random images — enough
    distinct files that the loader benchmark measures real decode work."""
    import os

    from PIL import Image

    done = os.path.join(root, ".complete")
    if os.path.exists(done):
        return root
    rng = np.random.RandomState(0)
    for c in range(classes):
        cdir = os.path.join(root, f"class_{c:03d}")
        os.makedirs(cdir, exist_ok=True)
        for i in range(per_class):
            # smooth low-frequency noise: realistic JPEG size/decode cost
            small = rng.randint(0, 256, (hw // 8, hw // 8, 3), np.uint8)
            img = Image.fromarray(small).resize((hw, hw), Image.BILINEAR)
            img.save(os.path.join(cdir, f"img_{i:04d}.jpg"), quality=85)
    with open(done, "w") as f:
        f.write("ok")
    return root


def h2d_cap_images_per_sec(batch_size: int = 256, hw: int = 256,
                           trials: int = 3) -> float:
    """Host→device transfer ceiling for one raw uint8 batch. On this dev box
    the TPU sits behind the axon tunnel at ~20-60 MB/s, so any loader-driven
    step is capped here (~100-300 img/s at batch 256 / 256px) no matter how
    fast the host pipeline decodes; on a real TPU VM this is PCIe/DMA at
    GB/s and the loader_only_* rates become the binding host-side numbers."""
    batch = np.random.RandomState(0).randint(
        0, 255, (batch_size, hw, hw, 3), np.uint8)
    x = jnp.asarray(batch)
    float(x[0, 0, 0, 0])  # warm the transfer + fetch path
    best = 0.0
    for _ in range(trials):
        t0 = time.perf_counter()
        x = jnp.asarray(batch)
        float(x[0, 0, 0, 0])
        best = max(best, batch_size / (time.perf_counter() - t0))
    return best


def loader_only_images_per_sec(loader_kind: str, batch_size: int = 256,
                               max_steps: int = 8) -> float:
    """Drain rate of the host input pipeline alone (JPEG decode + raw-canvas
    standardization + batching), no device in the loop — the framework-owned
    part of e2e input. Single shared CPU core on this host; scales with
    cores on production TPU VMs."""
    import tempfile

    from deltakd_tpu.data.pipeline import Loader
    from deltakd_tpu.data.sources import FolderSource

    root = _synthetic_imagefolder(
        os.path.join(tempfile.gettempdir(), "deltakd_bench_imagefolder"))
    source = FolderSource(root, raw_size=256, num_workers=16)
    if loader_kind == "tfdata":
        from deltakd_tpu.data.tfdata import TFDataLoader
        loader = TFDataLoader(source, batch_size=batch_size, is_train=True)
    else:
        loader = Loader(source, batch_size=batch_size, is_train=True)
    it = loader.epoch(0)
    next(it)  # warmup: thread-pool spin-up / tf.data buffer fill
    n = 0
    t0 = time.perf_counter()
    for _ in it:
        n += 1
        if n >= max_steps:
            break
    return batch_size * n / (time.perf_counter() - t0)


def e2e_images_per_sec(step, state, t_params, key, batch_size: int = 256,
                       max_steps: int = 10, loader_kind: str = "pil") -> float:
    """The VERDICT-honest number: drive a real FolderSource loader path
    (JPEG decode, host batching, H2D transfer) at the recipe batch 256 and
    time full steps including input. loader_kind 'pil' is the default
    thread-pool decoder; 'tfdata' is the engineered tf.data C++ pipeline."""
    import tempfile

    from deltakd_tpu.data.pipeline import Loader
    from deltakd_tpu.data.sources import FolderSource

    root = _synthetic_imagefolder(
        os.path.join(tempfile.gettempdir(), "deltakd_bench_imagefolder"))
    source = FolderSource(root, raw_size=256, num_workers=16)
    if loader_kind == "tfdata":
        from deltakd_tpu.data.tfdata import TFDataLoader
        loader = TFDataLoader(source, batch_size=batch_size, is_train=True)
    else:
        loader = Loader(source, batch_size=batch_size, is_train=True)
    epoch = jnp.asarray(0, jnp.int32)
    # the jitted step donates its state argument — copy so the caller's state
    # survives this run (main() calls this twice, pil then tfdata)
    state = jax.tree.map(jnp.copy, state)

    # one warmup step to compile at this batch size
    it = loader.epoch(0)
    imgs, labels, _ = next(it)
    state, m = step(state, t_params, jnp.asarray(imgs), jnp.asarray(labels),
                    key, epoch)
    float(m["train_loss"])
    # the tunnel's bare scalar-fetch cost must be subtracted (CLAUDE.md)
    t0 = time.perf_counter()
    float(m["train_loss"])
    fetch_cost = time.perf_counter() - t0

    n = 0
    t0 = time.perf_counter()
    for imgs, labels, _ in it:
        state, m = step(state, t_params, jnp.asarray(imgs),
                        jnp.asarray(labels), key, epoch)
        n += 1
        if n >= max_steps:
            break
    float(m["train_loss"])
    elapsed = time.perf_counter() - t0 - fetch_cost
    return batch_size * n / elapsed / len(jax.devices())


def _main_with_watchdog():
    """Fail loudly instead of hanging the driver: the tunneled TPU backend
    can wedge (jax.devices()/first compile block forever — see
    CLAUDE.md / memory). Run the benchmark in a child process and give it a
    hard deadline; on expiry, kill the child by PID and exit non-zero so the
    round records a failed bench rather than a stalled one."""
    import multiprocessing as mp
    import sys

    deadline_s = int(os.environ.get("DELTAKD_BENCH_DEADLINE_S", "1500"))
    ctx = mp.get_context("spawn")
    child = ctx.Process(target=main)
    child.start()
    child.join(deadline_s)
    if child.is_alive():
        child.kill()
        child.join(30)
        print(f"[bench] ERROR: no result within {deadline_s}s — TPU backend "
              f"unreachable or wedged; no JSON line emitted", file=sys.stderr)
        sys.exit(1)
    sys.exit(child.exitcode or 0)


if __name__ == "__main__":
    _main_with_watchdog()
