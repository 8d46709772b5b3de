"""Training configuration: a frozen dataclass plus an argparse shim.

The flag surface mirrors the reference CLI (reference tools/train.py:22-212) so
that every ``exp/*.sh`` recipe keeps working verbatim, but the internal
representation is an immutable dataclass: nothing mutates config at runtime
(the reference injects ``args.current_epoch`` mid-training,
reference tools/engine.py:47 — here the epoch is an explicit argument to the
loss instead).

TPU-specific additions (not in the reference) are grouped at the bottom of the
dataclass and all have safe defaults: mesh shape, dtype policy, checkpointing
backend knobs, and a ``teacher_checkpoint`` path (the reference pulls teacher
weights from the timm hub at runtime, reference model/models.py:60-63; on an
air-gapped TPU pod we import them from a local file instead).
"""

from __future__ import annotations

import argparse
import dataclasses
import warnings
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class TrainConfig:
    # --- model (reference train.py:25-33) ---
    teacher_model: str = "deit_small_distilled_patch16_224"
    student_model: str = "deit_tiny_patch16_224"
    fp16: bool = False
    input_size: int = 224

    # --- training hyperparameters (reference train.py:35-52) ---
    batch_size: int = 256
    amp: bool = False
    ema_decay: Optional[float] = None
    label_smoothing: float = 0.1
    drop_path_rate: float = 0.1
    num_workers: int = 10
    epochs: int = 300
    pin_mem: bool = True

    # --- optimizer (reference train.py:54-66) ---
    opt: str = "adamw"
    opt_eps: float = 1e-8
    opt_betas: Optional[Tuple[float, ...]] = None
    clip_grad: Optional[float] = None
    momentum: float = 0.9
    weight_decay: float = 0.05

    # --- scheduler (reference train.py:68-93) ---
    sched: str = "cosine"
    lr: float = 5e-4
    lr_noise: Optional[Tuple[float, ...]] = None
    lr_noise_pct: float = 0.67
    lr_noise_std: float = 1.0
    warmup_lr: float = 1e-6
    min_lr: float = 1e-5
    decay_epochs: float = 30
    warmup_epochs: int = 5
    cooldown_epochs: int = 10
    patience_epochs: int = 10
    decay_rate: float = 0.1

    # --- distributed (reference train.py:95-100; here: mesh knobs) ---
    gpus: Optional[str] = None  # accepted for recipe compatibility; unused on TPU
    dist_url: str = "env://"    # accepted for recipe compatibility; unused on TPU

    # --- distillation (reference train.py:102-136) ---
    distillation_type: str = "none"
    alpha: float = 0.1
    tau: float = 3.0
    lrkd_rank: int = 32
    lrkd_alpha: float = 0.1
    lrkd_beta: float = 0.1
    lrkd_gamma: float = 0.1
    saliency_method: int = 1
    saliency_mask_ratio: float = 0.5
    wasskd_type: str = "l1"
    sinkhorn_iters: int = 20  # ε-scaling levels for wasskd sinkhorn mode (+6 refinements; ≤0.6% vs exact OT)
    mgd_alpha: float = 7e-5
    mgd_mask_ratio: float = 0.5

    # --- saving and logging (reference train.py:138-146) ---
    log_file: str = "logs/train.log"
    save_dir: str = "checkpoints"
    wandb: bool = False
    wandb_project: str = "distill-vit"

    # --- data (reference train.py:148-154) ---
    data_path: str = "dataset"
    dataset: str = "imagenet-1k"
    eval_crop_ratio: float = 0.875

    # --- augmentation (reference train.py:156-197) ---
    mixup: float = 0.8
    cutmix: float = 1.0
    cutmix_minmax: Optional[Tuple[float, ...]] = None
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"
    reprob: float = 0.25
    remode: str = "pixel"
    recount: int = 1
    resplit: bool = False
    color_jitter: float = 0.3
    aa: str = "rand-m9-mstd0.5-inc1"
    smoothing: float = 0.1
    interpolation: str = "bicubic"
    repeated_aug: bool = True
    ThreeAugment: bool = False
    src: bool = False

    # --- misc (reference train.py:200-210) ---
    resume: bool = False
    finetune: bool = False
    checkpoint: Optional[str] = None
    seed: int = 42
    device: Optional[str] = None

    # --- TPU-native additions (no reference equivalent) ---
    teacher_checkpoint: Optional[str] = None  # local timm/torch state_dict or orbax dir
    mesh_shape: Optional[Tuple[int, ...]] = None  # (data,) or (data, model); default: all devices on data
    dtype: str = "bfloat16"        # compute dtype for model forward passes
    param_dtype: str = "float32"   # parameter storage dtype
    steps_per_epoch: Optional[int] = None  # cap steps/epoch (subset training & tests)
    eval_steps: Optional[int] = None       # cap eval steps
    synthetic_data: bool = False   # use a synthetic dataset (benchmarking / smoke tests)
    log_every: int = 10            # MetricLogger print frequency (reference engine.py:15)
    flash_attention: bool = True   # use the Pallas fused attention kernel when profitable
    donate_state: bool = True      # donate TrainState buffers into the jitted step
    prng_impl: str = "rbg"         # 'rbg' (TPU hardware RNG, faster) or 'threefry2x32'
    profile_dir: Optional[str] = None  # capture a jax.profiler trace of early steps
    data_loader: str = "python"    # 'python' (PIL threads) or 'tfdata' (tf.data C++)
    grad_accum_steps: int = 1      # micro-batches per optimizer step (global
    # batch = batch_size × data_axis × grad_accum_steps; single-chip stand-in
    # for the reference's multi-GPU global batches)
    aug_pixel_bf16: bool = True    # post-resample pixel augmentation ops in
    # bf16 (halves their HBM traffic; ±1/255 pixel tolerance, bounded by the
    # PIL-style integer quantization after the geometric stage). Default ON
    # since round 5: recipe-safety evidenced at outcome level under the
    # reference's default RandAugment recipe (benchmarks/EQUIVALENCE_RA_BF16.md
    # — within band of the fp32 torch stack); opt out: --no-aug-pixel-bf16.
    allow_random_teacher: bool = False  # permit KD against an uninitialized
    # teacher (tests/ablation only; reference always loads pretrained weights,
    # reference model/models.py:60-63)

    @property
    def mixup_active(self) -> bool:
        # reference train.py:288 / model/loss.py:245
        return self.mixup > 0 or self.cutmix > 0.0 or self.cutmix_minmax is not None

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> "TrainConfig":
        """Reject flag values we accept for CLI compatibility but do not honor.

        The reference's timm ``create_scheduler``/``create_transform`` surface
        includes LR-noise and random-erase variants (reference
        tools/train.py:54-93,156-197) that this rebuild does not implement;
        failing loudly beats silently training a different recipe.
        """
        if self.remode not in ("pixel", "const", "rand"):
            raise NotImplementedError(
                f"--remode '{self.remode}' is not implemented ('pixel', "
                f"'const', 'rand' are — the full timm RandomErasing mode "
                f"surface the reference forwards, reference train.py:173, "
                f"dataset/datasets.py:62-64)")
        # Parse --aa eagerly so unsupported policy strings (AutoAugment
        # 'v0'/'originalr'/'3a', AugMix, non-increasing/weighted rand
        # variants) reject at config time instead of silently training
        # jitter-only (round-4 review finding #3). The reference would pass
        # these to timm create_transform (reference dataset/datasets.py:
        # 56-64); parse_aa_spec documents exactly what is honored
        # (RandAugment 'rand-*-inc1' and AutoAugment 'original[-mstd#]').
        if self.aa:
            from deltakd_tpu.data.augment import parse_aa_spec

            parse_aa_spec(self.aa)
        if self.recount < 1:
            raise ValueError("--recount must be >= 1 (reference train.py:175)")
        if self.resplit:
            # Accepted no-op, matching the reference exactly: it parses
            # --resplit (reference train.py:177) but never forwards it to
            # timm's create_transform (reference dataset/datasets.py:56-64),
            # so the flag has no effect on the reference's training either.
            # (timm's re_split only matters with aug-splits, which the
            # reference never enables.)
            warnings.warn(
                "--resplit is accepted but has no effect, matching the "
                "reference, which parses it and never passes it to "
                "create_transform (dataset/datasets.py:56-64)")
        return self


def _none_or_float(v):
    return None if v in (None, "", "none", "None") else float(v)


def add_train_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """Register the full reference flag surface (reference tools/train.py:22-212)."""
    d = TrainConfig()

    # Model
    parser.add_argument("--teacher-model", type=str, default=d.teacher_model)
    parser.add_argument("--student-model", type=str, default=d.student_model)
    parser.add_argument("--fp16", action="store_true")
    parser.add_argument("--input-size", type=int, default=d.input_size)

    # Training
    parser.add_argument("--batch-size", type=int, default=d.batch_size)
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--ema-decay", type=float, default=None)
    parser.add_argument("--label-smoothing", type=float, default=d.label_smoothing)
    parser.add_argument("--drop-path-rate", type=float, default=d.drop_path_rate)
    parser.add_argument("--num-workers", type=int, default=d.num_workers)
    parser.add_argument("--epochs", type=int, default=d.epochs)
    parser.add_argument("--pin-mem", action="store_true", default=True)

    # Optimizer
    parser.add_argument("--opt", type=str, default=d.opt)
    parser.add_argument("--opt-eps", type=float, default=d.opt_eps)
    parser.add_argument("--opt-betas", type=float, nargs="+", default=None)
    parser.add_argument("--clip-grad", type=float, default=None)
    parser.add_argument("--momentum", type=float, default=d.momentum)
    parser.add_argument("--weight-decay", type=float, default=d.weight_decay)

    # Scheduler
    parser.add_argument("--sched", type=str, default=d.sched)
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--lr-noise", type=float, nargs="+", default=None)
    parser.add_argument("--lr-noise-pct", type=float, default=d.lr_noise_pct)
    parser.add_argument("--lr-noise-std", type=float, default=d.lr_noise_std)
    parser.add_argument("--warmup-lr", type=float, default=d.warmup_lr)
    parser.add_argument("--min-lr", type=float, default=d.min_lr)
    parser.add_argument("--decay-epochs", type=float, default=d.decay_epochs)
    parser.add_argument("--warmup-epochs", type=int, default=d.warmup_epochs)
    parser.add_argument("--cooldown-epochs", type=int, default=d.cooldown_epochs)
    parser.add_argument("--patience-epochs", type=int, default=d.patience_epochs)
    parser.add_argument("--decay-rate", "--dr", type=float, default=d.decay_rate)

    # Distributed (accepted for recipe compatibility)
    parser.add_argument("--gpus", type=str, default=None)
    parser.add_argument("--dist-url", type=str, default=d.dist_url)

    # Distillation. The reference also advertises vitkd_w_logit/aaakd/aaakd_w_logit
    # but they are unimplemented and raise at runtime (reference model/loss.py:238-239,
    # SURVEY.md B9); we drop them from choices.
    parser.add_argument(
        "--distillation-type", type=str, default=d.distillation_type,
        choices=["none", "soft", "hard", "vitkd", "lrkd", "diffkd",
                 "saliency_mgd", "curkd", "wasskd", "mgd"])
    parser.add_argument("--alpha", type=float, default=d.alpha)
    parser.add_argument("--tau", type=float, default=d.tau)
    parser.add_argument("--lrkd-rank", type=int, default=d.lrkd_rank)
    parser.add_argument("--lrkd-alpha", type=float, default=d.lrkd_alpha)
    parser.add_argument("--lrkd-beta", type=float, default=d.lrkd_beta)
    parser.add_argument("--lrkd-gamma", type=float, default=d.lrkd_gamma)
    parser.add_argument("--saliency-method", type=int, default=d.saliency_method)
    parser.add_argument("--saliency-mask-ratio", type=float, default=d.saliency_mask_ratio)
    parser.add_argument("--wasskd-type", type=str, default=d.wasskd_type)
    parser.add_argument("--sinkhorn-iters", type=int, default=d.sinkhorn_iters)
    parser.add_argument("--mgd-alpha", type=float, default=d.mgd_alpha)
    parser.add_argument("--mgd-mask-ratio", type=float, default=d.mgd_mask_ratio)

    # Saving / logging
    parser.add_argument("--log-file", type=str, default=d.log_file)
    parser.add_argument("--save-dir", type=str, default=d.save_dir)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--wandb-project", type=str, default=d.wandb_project)

    # Data
    parser.add_argument("--data-path", type=str, default=d.data_path)
    parser.add_argument("--dataset", type=str, default=d.dataset)
    parser.add_argument("--eval-crop-ratio", type=float, default=d.eval_crop_ratio)

    # Augmentation
    parser.add_argument("--mixup", type=float, default=d.mixup)
    parser.add_argument("--cutmix", type=float, default=d.cutmix)
    parser.add_argument("--cutmix-minmax", type=float, nargs="+", default=None)
    parser.add_argument("--mixup-prob", type=float, default=d.mixup_prob)
    parser.add_argument("--mixup-switch-prob", type=float, default=d.mixup_switch_prob)
    parser.add_argument("--mixup-mode", type=str, default=d.mixup_mode)
    parser.add_argument("--reprob", type=float, default=d.reprob)
    parser.add_argument("--remode", type=str, default=d.remode)
    parser.add_argument("--recount", type=int, default=d.recount)
    parser.add_argument("--resplit", action="store_true", default=False)
    parser.add_argument("--color-jitter", type=float, default=d.color_jitter)
    parser.add_argument("--aa", type=str, default=d.aa)
    parser.add_argument("--smoothing", type=float, default=d.smoothing)
    parser.add_argument("--interpolation", type=str, default=d.interpolation)
    parser.add_argument("--repeated-aug", action="store_true", dest="repeated_aug", default=True)
    parser.add_argument("--no-repeated-aug", action="store_false", dest="repeated_aug")
    parser.add_argument("--ThreeAugment", action="store_true", default=False)
    parser.add_argument("--src", action="store_true", default=False)

    # Misc
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--finetune", action="store_true")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--device", type=str, default=None)

    # TPU-native additions
    parser.add_argument("--teacher-checkpoint", type=str, default=None)
    parser.add_argument("--mesh-shape", type=int, nargs="+", default=None)
    parser.add_argument("--dtype", type=str, default=d.dtype,
                        choices=["bfloat16", "float32"])
    parser.add_argument("--param-dtype", type=str, default=d.param_dtype)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--eval-steps", type=int, default=None)
    parser.add_argument("--synthetic-data", action="store_true", default=False)
    parser.add_argument("--log-every", type=int, default=d.log_every)
    parser.add_argument("--no-flash-attention", action="store_false",
                        dest="flash_attention", default=True)
    parser.add_argument("--prng-impl", type=str, default=d.prng_impl,
                        choices=["rbg", "threefry2x32"])
    parser.add_argument("--profile-dir", type=str, default=None)
    parser.add_argument("--data-loader", type=str, default=d.data_loader,
                        choices=["python", "tfdata"])
    parser.add_argument("--grad-accum-steps", type=int, default=d.grad_accum_steps)
    parser.add_argument("--aug-pixel-bf16", action=argparse.BooleanOptionalAction,
                        default=d.aug_pixel_bf16)
    parser.add_argument("--allow-random-teacher", action="store_true", default=False)
    return parser


def parse_args(argv=None) -> TrainConfig:
    parser = argparse.ArgumentParser(
        description="TPU-native ViT knowledge-distillation training")
    add_train_args(parser)
    return config_from_namespace(parser.parse_args(argv))


def config_from_namespace(ns: argparse.Namespace) -> TrainConfig:
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    kw = {k: v for k, v in vars(ns).items() if k in fields}
    for tup_field in ("opt_betas", "lr_noise", "cutmix_minmax", "mesh_shape"):
        if kw.get(tup_field) is not None:
            kw[tup_field] = tuple(kw[tup_field])
    # `--fp16` / `--amp` both map to bf16 compute on TPU (no loss scaler needed:
    # bf16 has fp32 exponent range; reference NativeScaler at train.py:266 has no
    # TPU equivalent by design).
    if kw.get("fp16") or kw.get("amp"):
        kw["dtype"] = "bfloat16"
    return TrainConfig(**kw).validate()
