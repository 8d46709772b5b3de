"""Fully-fused ViT transformer block (Pallas, TPU).

Round-1 profiling (benchmarks/bench_components.py + per-op microbench) put
the unfused block at 7-15% MFU: the [B,N,3,H,hd] qkv split/merge transposes
cost ~0.7 ms/block at batch 256, every LayerNorm/residual is an HBM round
trip, and the per-(batch*head) flash-attention grid runs [198,64] matmuls at
~40% MXU utilization. This kernel runs ONE grid step per batch element and
keeps the entire block resident in VMEM:

    LN1 -> QKV matmul -> per-head attention -> proj -> +residual
        -> LN2 -> MLP (GELU) -> +residual

DeiT shapes make this easy: one element's activations (x 198x192,
qkv 198x576, hidden 198x768, one 198x198 score matrix at a time) total
under 2 MB; all block weights are another ~1 MB bf16 — far inside the
~16 MB VMEM budget even for the DeiT-Small teacher (D=384).

The backward pass stores only the block *input* (plus the droppath scales)
and recomputes the forward inside one grid step — flash-attention-style
recomputation extended to the whole block — then backprops in reverse,
accumulating fp32 weight grads across the (sequential) grid.

Heads are unrolled statically; q/k/v per head are static 64-aligned lane
slices of the packed [N, 3D] qkv buffer (timm packs the qkv output dim as
(3, H, hd) — reference tests/torch_ref.py mirrors this), so no transpose
ever materializes.

Stochastic depth: the residual adds take per-sample branch scales
(mask/keep_prob in {0, 1/keep}), drawn outside — `x + s*branch(LN(x))` is
exactly timm DropPath semantics (reference model/models.py builds timm
blocks; drop_path rate ramps linearly across depth).

Per-block hook features (post-MLP, pre-droppath, pre-residual — what the
reference's forward hooks capture, model/models.py:181-199) are an optional
second output so logit-KD recipes don't pay the extra [B,N,D] write.

Measured dead ends (round 3, v5e-1; kept so nobody re-tries them):
  * Stash-instead-of-recompute backward (write bf16 qkv / softmax e,1/S /
    merged / h / gelu' to HBM in the forward, read them back in the
    backward): fwd +0.9 ms at b256 — the stash writes serialize at an
    effective ~330 GB/s instead of overlapping, and the backward's stash
    reads cost more than the matmul recompute they replace
    (benchmarks/scratch_stash.py). Recompute stands.
  * Hybrid Pallas-forward + XLA-autodiff backward: XLA computes weight
    grads as one [B*N] contraction (MXU-friendly) but re-materializes
    every intermediate through HBM; fused fwd+bwd beats it at every batch
    size measured at the full-model level.
  * Polynomial transcendentals (deg-8 Chebyshev erf-GELU with polynomial
    derivative, exp2-scalb softmax with log2e folded into the q-scale):
    kernel-level -4..-6% inside run-to-run noise, full-model level
    student fwd+bwd -2.8%, teacher fwd regressed; Mosaic's exp lowering
    is already cheap — the VPU cost is data passes, not op complexity
    (benchmarks/scratch_poly.py). Not merged.
  * TB=2 batch tiles (two elements per grid step as ONE batched op chain,
    stacked matmuls): no win over TB=1 (round-2 measurement, machinery
    dropped in 949d2f8). NOT the same as the shipped tb>1 independent
    per-element chains (see _fwd_kernel), which DO win: separate chains
    give the scheduler MXU/VPU overlap; a batched chain is still one
    serial dependency line.
  * int8 weight matmuls for the frozen teacher (symmetric per-channel
    weights + per-token dynamic activation scales): the s8xs8->s32 MXU
    double-rate mode is not reachable through this stack — a bare s8 dot
    runs at ~bf16 speed in both Mosaic and XLA, and the full D=384 block
    loses 9% to the quant/dequant passes (benchmarks/scratch_int8.py).
  * Block-PAIR fusion (round 4, kernels kept below, default OFF): the
    isolated two-block ablation won -10.1% fwd+bwd at D=192
    (benchmarks/scratch_twoblock.py), but the FULL-MODEL interleaved A/B
    (benchmarks/scratch_pair_model.py, soft-KD step, 4-5 rounds, ±0.1%
    spread) measured pair +2.2% at BOTH b256 and b448, and a hybrid
    single-fwd + pair-bwd variant (DELTAKD_PAIR_HYBRID=1) +1.9% — i.e.
    the pair BACKWARD itself loses at model level. Two effects the
    isolated pair misses: (a) across separate pallas_calls the scheduler
    overlaps the next block's weight/activation DMA with the current
    kernel's tail, so the mid-activation HBM round trip the pair removes
    was already partly hidden; (b) the pair backward's doubled live set
    forces tb=2 vs the single backward's tb=4 — half the independent
    per-element chains, and those chains are what buy MXU/VPU overlap
    (see the TB note above). DELTAKD_PAIR=1 re-enables for A/B runs on
    hardware with different VMEM/BW ratios.
  * Lane-packing the ragged dims (round 4, benchmarks/scratch_lanepack.py):
    premise was that [198, 192] VPU stages waste the half-masked second
    lane tile (192 = 128 + 64) and a [297, 128] full-tile layout of the
    same 38016 elements would cut ~24% of tile-ops. Measured: a 24-pass
    transcendental chain runs EQUAL in both layouts (-0.4%, inside noise)
    — Mosaic's VPU cost tracks element count, not padded-tile count, so
    there is no waste to reclaim. The integration path is closed twice
    over: an in-kernel [198,192]->[297,128] jnp.reshape does not even
    compile ("infer-vector-layout: unsupported shape cast"), so packed
    stages would need HBM-level relayouts that cost the very data passes
    they'd save.
  * Teacher+student CO-SCHEDULED forward kernel (round 4,
    benchmarks/scratch_comix.py): premise was that the teacher fwd
    (D=384, MXU-busy, ~58% MFU) and student fwd (D=192, VPU/data-pass
    heavy) have complementary bottlenecks, so one kernel running both
    models' chains per grid step could hide the student forward under
    the teacher's matmuls (TPU cores run one op at a time, so separate
    pallas_calls can never share units). Measured at B=256, N=198,
    interleaved rounds: 1 teacher + 1 student chain per step +23%, 2+2
    chains +10.5% vs the production-shaped serial kernels (teacher tb=4
    then student tb=8); best single rounds reached only parity. The
    same-model tb chains already saturate the cross-unit overlap — the
    merged kernel's halved per-model chain count costs more ILP than
    cross-model complementarity buys back. Numerics were exact (CPU
    interpret + on-chip diff 0.0), so the integration (custom-vjp fwd
    running the merged kernel, existing student-only fused backward)
    remains valid if a future chip's VMEM/unit ratios flip the result.
  Timing protocol note: the chip throttles ~15% within seconds of
  sustained load, so kernel-level A/B comparisons must interleave variants
  round-robin (benchmarks/scratch_vpu.py); full-model timings are stable
  to ±0.5% and are the only trustworthy decision basis.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import (SdyShardingRule,
                                                  custom_partitioning)
from jax.sharding import NamedSharding, PartitionSpec

try:  # pallas TPU backend is unavailable on CPU test runs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

# Interpret mode runs the kernel as traced JAX ops (works on CPU) — used by
# the virtual-mesh tests and the multi-chip dry run to exercise the exact
# fused + custom_partitioning code path without TPU hardware. Opt-in: the
# CPU test suite must not silently take the (slow) interpreted kernel.
_INTERPRET = os.environ.get("DELTAKD_FUSED_INTERPRET") == "1"


def set_interpret(on: bool) -> None:
    """Force pallas interpret mode (CPU-executable kernels) process-wide."""
    global _INTERPRET
    _INTERPRET = bool(on)


# -----------------------------------------------------------------------------
# Shared math (identical formulas in fwd kernel, bwd recompute, and reference)
# -----------------------------------------------------------------------------

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf(x):
    """Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7); Pallas TPU has no erf."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_from_u(x, u):
    """A&S 7.1.26 with the exp supplied: u = exp(-x*x) for x >= 0 pre-|.|;
    callers pass u = exp(-(x*INV_SQRT2)^2) = exp(-0.5*x_orig^2)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * u)


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _gelu_and_grad(x):
    """(gelu(x), gelu'(x)) sharing ONE transcendental: u = exp(-x^2/2) is
    both the erf poly's exp(-(x/sqrt2)^2) and the pdf term phi — the
    backward's dominant VPU cost was three separate exp/erf passes over the
    [N, 4D] hidden (kernel is VPU-bound at D=192, benchmarks/scratch_kernels
    round-3 ablation: stripping gelu+softmax lifted fwd 45.7->78.1 TF/s)."""
    u = jnp.exp(-0.5 * x * x)
    cdf = 0.5 * (1.0 + _erf_from_u(x * _INV_SQRT2, u))
    return x * cdf, cdf + x * u * _INV_SQRT2PI


def _ln_fwd(x32, gamma, beta, eps):
    """Returns (y, xhat, rstd). All fp32, reductions over the lane dim."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * gamma + beta, xhat, rstd


def _ln_bwd(dy, xhat, rstd, gamma):
    """dx for y = xhat*gamma + beta. Returns (dx, dgamma_rows, dbeta_rows) —
    the weight grads still need a sum over rows by the caller."""
    dxhat = dy * gamma
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (dxhat - m1 - xhat * m2) * rstd
    return dx, dy * xhat, dy


def _attention_fwd_one(qkv32, D, H, scale, dtype, post_div=False):
    """Per-head attention over a packed [N, 3D] fp32 qkv buffer → [N, D].

    With post_div=True, softmax normalization happens AFTER the e@v matmul,
    on the [N, hd] output instead of the [N, N] probability matrix —
    mathematically identical ((e/S)@v == (e@v)/S since S is per-row), and
    the [N, N] division pass was 18% of the whole forward at D=192 in the
    round-3 ablation (the kernel is VPU-bound there; see _gelu_and_grad
    note). Kernel-only: the pure-XLA reference keeps the classic pre-div
    order so its fp32 numerics match the flax module bit-for-bit-ish (the
    unnormalized e@v accumulates at a ~N× larger magnitude, which costs a
    few ulps under the TPU's default pass-split matmul precision)."""
    hd = D // H
    outs = []
    for h in range(H):
        q = qkv32[:, h * hd:(h + 1) * hd]
        k = qkv32[:, D + h * hd:D + (h + 1) * hd]
        v = qkv32[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general(
            (q * scale).astype(dtype), k.astype(dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        if post_div:
            o = jax.lax.dot_general(
                e.astype(dtype), v.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(o / jnp.sum(e, axis=-1, keepdims=True))
        else:
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            outs.append(jax.lax.dot_general(
                p.astype(dtype), v.astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=-1)


def _block_math_fwd(x32, w, eps, H, dtype, s_attn, s_mlp, post_div=False):
    """The whole block forward in fp32-accumulated math on one element.

    x32: [N, D] tokens; s_attn/s_mlp: scalar droppath branch scales. Returns
    (out, feat) where feat is the post-MLP pre-residual hidden state.

    Note: a TB=2 batch-tile variant (two elements per grid step, flattened
    token-parallel matmuls, per-element attention via leading-dim reshapes)
    was built and measured in round 2 to chase the D=192 ILP gap — it was
    SLOWER everywhere (fwd+bwd 3.34→4.81 ms at D=192/B=256; the stack/
    reshape seams relayout and the doubled working set hurts grid
    pipelining). One element per grid step is the measured optimum; the
    tiled variant lives in git history (commit 2ad2f5c).
    """
    D = x32.shape[-1]
    scale = (D // H) ** -0.5

    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], eps)
    qkv = jax.lax.dot_general(y.astype(dtype), w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    merged = _attention_fwd_one(qkv, D, H, scale, dtype, post_div=post_div)
    attn = jax.lax.dot_general(merged.astype(dtype), w["wproj"],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + s_attn * attn

    z, _, _ = _ln_fwd(x2, w["g2"], w["b2"], eps)
    hpre = jax.lax.dot_general(z.astype(dtype), w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    h = _gelu(hpre)
    feat = jax.lax.dot_general(h.astype(dtype), w["w2"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf2"]
    out = x2 + s_mlp * feat
    return out, feat


_W_NAMES = ("g1", "b1", "wqkv", "bqkv", "wproj", "bproj",
            "g2", "b2", "w1", "bf1", "w2", "bf2")


def _weight_arrays(params: Dict[str, Any], dtype) -> Tuple[jax.Array, ...]:
    """Flatten the Flax block param tree into the kernel operand order.

    Matmul weights are cast to the compute dtype (bf16 MXU inputs); LN params
    and biases stay fp32 (they only enter fp32 VPU adds)."""
    D = params["norm1"]["scale"].shape[-1]
    H4 = params["mlp"]["fc1"]["kernel"].shape[-1]
    return (
        params["norm1"]["scale"].reshape(1, D).astype(jnp.float32),
        params["norm1"]["bias"].reshape(1, D).astype(jnp.float32),
        params["attn"]["qkv"]["kernel"].astype(dtype),
        params["attn"]["qkv"]["bias"].reshape(1, 3 * D).astype(jnp.float32),
        params["attn"]["proj"]["kernel"].astype(dtype),
        params["attn"]["proj"]["bias"].reshape(1, D).astype(jnp.float32),
        params["norm2"]["scale"].reshape(1, D).astype(jnp.float32),
        params["norm2"]["bias"].reshape(1, D).astype(jnp.float32),
        params["mlp"]["fc1"]["kernel"].astype(dtype),
        params["mlp"]["fc1"]["bias"].reshape(1, H4).astype(jnp.float32),
        params["mlp"]["fc2"]["kernel"].astype(dtype),
        params["mlp"]["fc2"]["bias"].reshape(1, D).astype(jnp.float32),
    )


def _fwd_kernel(x_ref, s_attn_ref, s_mlp_ref, *rest, eps, H, need_feat, tb):
    w_refs = rest[:len(_W_NAMES)]
    out_refs = rest[len(_W_NAMES):]
    w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
    b = pl.program_id(0)
    # tb INDEPENDENT per-element chains per grid step (they share only the
    # weight refs): Mosaic's scheduler overlaps one chain's MXU phase with
    # another's VPU phase — measured ~max() instead of sum() on a bare
    # MXU-chain + exp-chain probe, and -8/-9% on this forward at D=192
    # (benchmarks/scratch_stagger.py). Distinct from the round-2 TB=2
    # batched-op tiles (one chain over stacked elements — slower, see the
    # dead-ends list above).
    for i in range(tb):
        x32 = x_ref[i].astype(jnp.float32)
        out, feat = _block_math_fwd(x32, w, eps, H, x_ref.dtype,
                                    s_attn_ref[b * tb + i, 0],
                                    s_mlp_ref[b * tb + i, 0],
                                    post_div=True)
        out_refs[0][i] = out.astype(out_refs[0].dtype)
        if need_feat:
            out_refs[1][i] = feat.astype(out_refs[1].dtype)


def _row_spec(n, d, tb=1):
    return pl.BlockSpec((tb, n, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


# Per-grid-step activation budget for picking the chain count. Measured
# optima: bwd D=192 N=198 -> 4, bwd D=384 -> 2, anything at N=578 -> 1 —
# all reproduced by a ~9 MB live-set cap. For 224px FORWARDS a deeper queue
# wins a little more (student D=192 -> tb=8, teacher D=384 -> tb=4: +0.4%
# full-model, reproducible across interleaved rounds — benchmarks/
# scratch_tb8.py), so forwards at N<=256 get a 16 MB cap; N=578 keeps the
# 9 MB cap (tb=2 there was measured slower in the round-2 tile scan).
_TB_BUDGET_BYTES = 9 * 2 ** 20
_TB_FWD_BUDGET_BYTES = 16 * 2 ** 20


def _pick_tb(B, N, D, *, bwd, pair=False):
    # rough fp32 live set per element: ~8.5 D-wide rows + one [N, N] score
    # forward; backward adds grad mirrors and the per-head (e, 1/S) stash.
    # A block PAIR holds two blocks' live sets per chain (the pair backward
    # keeps both stashes in VMEM) — measured optima at N=198: fwd D=192
    # tb 4, bwd D=192 tb 2, bwd D=384 tb 1, all reproduced by doubling elem
    # (benchmarks/scratch_twoblock.py).
    elem = 4 * N * ((12 * D + 2 * N) if bwd else (8.5 * D + N))
    if pair:
        elem *= 2
    budget = _TB_BUDGET_BYTES if (bwd or N > 256) else _TB_FWD_BUDGET_BYTES
    for tb in (8, 4, 2):
        if B % tb == 0 and tb * elem <= budget:
            return tb
    return 1


def _w_specs(ws):
    return [pl.BlockSpec(w.shape, lambda b, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM) for w in ws]


def _scale_spec(B):
    # whole [B,1] array in SMEM (block==array is always legal); kernels index
    # the current element with pl.program_id(0)
    return pl.BlockSpec((B, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)


def _fused_block_fwd_call(x, s_attn, s_mlp, ws, *, eps, H, need_feat):
    """Local (per-shard) fused forward. Returns (out, feat) or a bare out."""
    B, N, D = x.shape
    tb = _pick_tb(B, N, D, bwd=False)
    out_shape = [jax.ShapeDtypeStruct((B, N, D), x.dtype)]
    out_specs = [_row_spec(N, D, tb)]
    if need_feat:
        out_shape.append(jax.ShapeDtypeStruct((B, N, D), x.dtype))
        out_specs.append(_row_spec(N, D, tb))
    # qkv 6ND² + proj 2ND² + mlp 16ND² + attention 4N²D (matmul FLOPs)
    flops_elem = 24 * N * D * D + 4 * N * N * D
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, H=H, need_feat=need_feat,
                          tb=tb),
        grid=(B // tb,),
        in_specs=[_row_spec(N, D, tb), _scale_spec(B), _scale_spec(B)]
        + _w_specs(ws),
        out_specs=tuple(out_specs) if need_feat else out_specs[0],
        out_shape=tuple(out_shape) if need_feat else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=B * flops_elem,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize * (3 if need_feat else 2),
            transcendentals=B * N * D * 5),
        compiler_params=pltpu.CompilerParams(
            # Mosaic's scoped-stack accounting sums same-scope temporaries;
            # at 384px (N=578) that nominal sum exceeds the 16 MB default
            # while the true live set still fits — raise the cap
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, s_attn, s_mlp, *ws)


# -----------------------------------------------------------------------------
# Backward: recompute the forward per element, then reverse it.
# -----------------------------------------------------------------------------

def _attention_fwd_stash(qkv, D, H, scale, dtype):
    """Forward attention that also returns the per-head unnormalized
    probability matrices and reciprocal row sums, so the backward can reuse
    them instead of rebuilding the scores (saves one [N,N] matmul and one
    exp pass per head — the backward previously rebuilt softmax twice)."""
    hd = D // H
    outs, es, rss = [], [], []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general((q * scale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        rs = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(e.astype(dtype), v.astype(dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o * rs)
        es.append(e)
        rss.append(rs)
    return jnp.concatenate(outs, axis=-1), es, rss


def _attention_bwd_one(qkv, dmerged, es, rss, D, H, hd, scale, dtype):
    """dqkv [N, 3D] for one element from the stashed (e, 1/S) per head.

    All softmax normalizations are folded into [N, hd] row scalings —
    with p = e·rS (rS the per-row reciprocal sum):
      dv = pᵀ@do           = eᵀ @ (do·rS)
      ds = p·(dp − c)      = rS · t,  t = e·(dp − c),  c = rowsum(dp·e)·rS
      dq = (ds@k)·scale    = (t@k) · (scale·rS)
      dk = dsᵀ@(q·scale)   = tᵀ @ (q·scale·rS)
    so no [N, N] division/scaling pass ever runs (VPU-bound regime)."""
    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for i in range(H):
        q = qkv[:, i * hd:(i + 1) * hd]
        k = qkv[:, D + i * hd:D + (i + 1) * hd]
        v = qkv[:, 2 * D + i * hd:2 * D + (i + 1) * hd]
        e, rs = es[i], rss[i]
        do = dmerged[:, i * hd:(i + 1) * hd]
        dv = jax.lax.dot_general(e.astype(dtype), (do * rs).astype(dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do.astype(dtype), v.astype(dtype),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        c = jnp.sum(dp * e, axis=-1, keepdims=True) * rs
        t = (e * (dp - c)).astype(dtype)
        dq = jax.lax.dot_general(t, k.astype(dtype), (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * (scale * rs)
        dk = jax.lax.dot_general(t, (q * (scale * rs)).astype(dtype),
                                 (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dqkv_parts_q.append(dq)
        dqkv_parts_k.append(dk)
        dqkv_parts_v.append(dv)
    return jnp.concatenate(dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=-1)


def _bwd_kernel(x_ref, s_attn_ref, s_mlp_ref, *rest, eps, H, need_feat, tb):
    n_w = len(_W_NAMES)
    w_refs = rest[:n_w]
    if need_feat:
        g_out_ref, g_feat_ref = rest[n_w], rest[n_w + 1]
        dx_ref = rest[n_w + 2]
        dw_refs = rest[n_w + 3:]
    else:
        g_out_ref = rest[n_w]
        g_feat_ref = None
        dx_ref = rest[n_w + 1]
        dw_refs = rest[n_w + 2:]

    w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
    dtype = x_ref.dtype
    _, N, D = x_ref.shape
    hd = D // H
    scale = hd ** -0.5
    b = pl.program_id(0)

    # tb independent recompute+backprop chains (see _fwd_kernel note);
    # their weight-grad tiles are summed, then accumulated across the
    # sequential grid. Measured -10.6% at D=192 / -10% at D=384
    # (benchmarks/scratch_stagger.py bwd).
    acc = None
    for i in range(tb):
        tiles = _bwd_one_chain(
            x_ref[i].astype(jnp.float32), g_out_ref, g_feat_ref, dx_ref, w,
            s_attn_ref[b * tb + i, 0], s_mlp_ref[b * tb + i, 0],
            i, eps, H, N, D, hd, scale, dtype, need_feat)
        acc = tiles if acc is None else tuple(a + t
                                              for a, t in zip(acc, tiles))

    @pl.when(b == 0)
    def _():
        for r, t in zip(dw_refs, acc):
            r[...] = t

    @pl.when(b > 0)
    def _():
        for r, t in zip(dw_refs, acc):
            r[...] += t


def _block_fwd_stash(x32, w, s_attn, eps, H, D, scale, dtype, s_mlp=None):
    """Recompute one block's forward, keeping every intermediate the reverse
    sweep needs (all in VMEM/registers — nothing goes to HBM).

    When ``s_mlp`` is given, also computes the block OUTPUT (one extra
    [N,4D]@[4D,D] matmul) so a multi-block backward can chain stashes;
    the single-block backward passes None and skips it."""
    y, xhat1, rstd1 = _ln_fwd(x32, w["g1"], w["b1"], eps)
    y_lp = y.astype(dtype)
    qkv = jax.lax.dot_general(y_lp, w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    merged, att_es, att_rss = _attention_fwd_stash(qkv, D, H, scale, dtype)
    merged_lp = merged.astype(dtype)
    attn = jax.lax.dot_general(merged_lp, w["wproj"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + s_attn * attn
    z, xhat2, rstd2 = _ln_fwd(x2, w["g2"], w["b2"], eps)
    z_lp = z.astype(dtype)
    hpre = jax.lax.dot_general(z_lp, w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    h, hgrad = _gelu_and_grad(hpre)
    h_lp = h.astype(dtype)
    out = None
    if s_mlp is not None:
        feat = jax.lax.dot_general(h_lp, w["w2"], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) + w["bf2"]
        out = x2 + s_mlp * feat
    stash = (y_lp, qkv, att_es, att_rss, merged_lp, xhat1, rstd1,
             xhat2, rstd2, z_lp, h_lp, hgrad)
    return out, stash


def _block_bwd_reverse(stash, w, g_out, g_feat_extra, s_attn, s_mlp,
                       eps, H, D, hd, scale, dtype):
    """Reverse sweep of one block from its stash. ``g_out`` is the fp32
    [N, D] cotangent at the block output; ``g_feat_extra`` an optional extra
    cotangent injected at the post-MLP pre-residual feature (the KD hook).
    Returns (dx32, weight-grad tiles)."""
    (y_lp, qkv, att_es, att_rss, merged_lp, xhat1, rstd1,
     xhat2, rstd2, z_lp, h_lp, hgrad) = stash

    g_feat = g_out * s_mlp
    if g_feat_extra is not None:
        g_feat = g_feat + g_feat_extra
    g_feat_lp = g_feat.astype(dtype)

    # MLP: feat = h @ w2 + bf2
    dw2 = jax.lax.dot_general(h_lp, g_feat_lp, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbf2 = jnp.sum(g_feat, axis=0, keepdims=True)
    dh = jax.lax.dot_general(g_feat_lp, w["w2"], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dhpre = dh * hgrad
    dhpre_lp = dhpre.astype(dtype)
    dw1 = jax.lax.dot_general(z_lp, dhpre_lp, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dbf1 = jnp.sum(dhpre, axis=0, keepdims=True)
    dz = jax.lax.dot_general(dhpre_lp, w["w1"], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx2_ln, dg2_rows, db2_rows = _ln_bwd(dz, xhat2, rstd2, w["g2"])
    dg2 = jnp.sum(dg2_rows, axis=0, keepdims=True)
    db2 = jnp.sum(db2_rows, axis=0, keepdims=True)
    dx2 = g_out + dx2_ln

    # proj: attn = merged @ wproj + bproj ; x2 = x + s_attn*attn
    dattn = dx2 * s_attn
    dattn_lp = dattn.astype(dtype)
    dwproj = jax.lax.dot_general(merged_lp, dattn_lp, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(dattn, axis=0, keepdims=True)
    dmerged = jax.lax.dot_general(dattn_lp, w["wproj"], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    # attention backward per head, reusing the recompute's (e, 1/S) stash
    dqkv = _attention_bwd_one(qkv, dmerged, att_es, att_rss, D, H, hd, scale,
                              dtype)
    dqkv_lp = dqkv.astype(dtype)

    # qkv = LN1(x) @ wqkv + bqkv
    dwqkv = jax.lax.dot_general(y_lp, dqkv_lp, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dy = jax.lax.dot_general(dqkv_lp, w["wqkv"], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ln, dg1_rows, db1_rows = _ln_bwd(dy, xhat1, rstd1, w["g1"])
    dg1 = jnp.sum(dg1_rows, axis=0, keepdims=True)
    db1 = jnp.sum(db1_rows, axis=0, keepdims=True)

    return dx2 + dx_ln, (dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2, db2,
                         dw1, dbf1, dw2, dbf2)


def _bwd_one_chain(x32, g_out_ref, g_feat_ref, dx_ref, w, s_attn, s_mlp,
                   i, eps, H, N, D, hd, scale, dtype, need_feat):
    """One element's recompute-forward + reverse sweep; writes dx_ref[i] and
    returns this element's weight-grad tiles."""
    _, stash = _block_fwd_stash(x32, w, s_attn, eps, H, D, scale, dtype)
    g_out = g_out_ref[i].astype(jnp.float32)
    g_feat_extra = g_feat_ref[i].astype(jnp.float32) if need_feat else None
    dx32, tiles = _block_bwd_reverse(stash, w, g_out, g_feat_extra,
                                     s_attn, s_mlp, eps, H, D, hd, scale,
                                     dtype)
    dx_ref[i] = dx32.astype(dx_ref.dtype)
    return tiles


def _fused_block_bwd_call(x, s_attn, s_mlp, ws, g_out, g_feat, *, eps, H):
    """Local (per-shard) fused backward. Returns the flat (dx, *dws) tuple;
    the dws are this shard's PARTIAL sums — the caller psums over any batch
    sharding axes."""
    B, N, D = x.shape
    tb = _pick_tb(B, N, D, bwd=True)
    need_feat = g_feat is not None
    g_in = [g_out] + ([g_feat] if need_feat else [])
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, H=H, need_feat=need_feat,
                          tb=tb),
        grid=(B // tb,),
        in_specs=([_row_spec(N, D, tb), _scale_spec(B), _scale_spec(B)]
                  + _w_specs(ws) + [_row_spec(N, D, tb)] * len(g_in)),
        out_specs=tuple([_row_spec(N, D, tb)] + _w_specs(ws)),
        out_shape=tuple([jax.ShapeDtypeStruct((B, N, D), x.dtype)] + dw_shapes),
        cost_estimate=pl.CostEstimate(
            flops=3 * B * (24 * N * D * D + 4 * N * N * D),
            bytes_accessed=4 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * D * 10),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, s_attn, s_mlp, *ws, *g_in)


# -----------------------------------------------------------------------------
# Multi-chip partitioning: the Mosaic custom call has no GSPMD/Shardy rule, so
# under a multi-device mesh the partitioner would otherwise fall back to
# replicating the global batch per chip. custom_partitioning supplies the
# obvious SPMD decomposition: the batch dim partitions freely (every grid step
# is one independent batch element), weights are replicated, and the backward
# weight-grads — per-shard partial sums — are psum'd over the batch-sharding
# mesh axes. This is the TPU equivalent of the reference's DDP gradient
# all-reduce (reference tools/utils.py:23-65) happening *inside* the kernel's
# partitioning rule. Activations stay [B-local, N, D] per chip end to end.
# -----------------------------------------------------------------------------

_CP_CACHE: Dict[Tuple, Any] = {}


def _batch_axes(sharding):
    """Mesh axis name(s) an array's leading dim is sharded over, or None."""
    spec = getattr(sharding, "spec", None)
    if not spec or len(spec) == 0:
        return None
    return spec[0]


def _w_factor_mappings():
    return tuple((f"w{i}a", f"w{i}b") for i in range(len(_W_NAMES)))


def _fwd_sharding_rule(need_feat: bool) -> SdyShardingRule:
    wmaps = _w_factor_mappings()
    x_map = ("b", "n", "d")
    s_map = ("b", "u")
    out_maps = (x_map, x_map) if need_feat else (x_map,)
    non_batch = ("n", "d", "u") + tuple(f for m in wmaps for f in m)
    return SdyShardingRule(
        operand_mappings=(x_map, s_map, s_map) + wmaps,
        result_mappings=out_maps,
        need_replication_factors=non_batch)


def _bwd_sharding_rule(need_feat: bool) -> SdyShardingRule:
    wmaps = _w_factor_mappings()
    x_map = ("b", "n", "d")
    s_map = ("b", "u")
    g_maps = (x_map, x_map) if need_feat else (x_map,)
    non_batch = ("n", "d", "u") + tuple(f for m in wmaps for f in m)
    return SdyShardingRule(
        operand_mappings=(x_map, s_map, s_map) + wmaps + g_maps,
        result_mappings=(x_map,) + wmaps,
        need_replication_factors=non_batch)


def _fwd_shardings(mesh, baxes, need_feat):
    x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
    s_sh = NamedSharding(mesh, PartitionSpec(baxes, None))
    repl = NamedSharding(mesh, PartitionSpec())
    args = (x_sh, s_sh, s_sh) + (repl,) * len(_W_NAMES)
    outs = (x_sh, x_sh) if need_feat else x_sh
    return args, outs


def _get_fwd_partitioned(need_feat: bool, eps: float, H: int):
    key = ("fwd", need_feat, eps, H)
    if key in _CP_CACHE:
        return _CP_CACHE[key]

    def local(x, s_attn, s_mlp, *ws):
        return _fused_block_fwd_call(x, s_attn, s_mlp, ws, eps=eps, H=H,
                                     need_feat=need_feat)

    def infer(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes[0].sharding)
        _, outs = _fwd_shardings(mesh, baxes, need_feat)
        return outs

    def partition(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes[0].sharding)
        args, outs = _fwd_shardings(mesh, baxes, need_feat)
        return mesh, local, outs, args

    cp = custom_partitioning(local)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule=_fwd_sharding_rule(need_feat))
    _CP_CACHE[key] = cp
    return cp


def _get_bwd_partitioned(need_feat: bool, eps: float, H: int):
    key = ("bwd", need_feat, eps, H)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    n_w = len(_W_NAMES)

    def local(x, s_attn, s_mlp, *rest):
        ws, gs = rest[:n_w], rest[n_w:]
        g_feat = gs[1] if need_feat else None
        return _fused_block_bwd_call(x, s_attn, s_mlp, ws, gs[0], g_feat,
                                     eps=eps, H=H)

    def out_shardings(mesh, baxes):
        x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
        repl = NamedSharding(mesh, PartitionSpec())
        return (x_sh,) + (repl,) * n_w

    def infer(mesh, arg_shapes, result_shape):
        return out_shardings(mesh, _batch_axes(arg_shapes[0].sharding))

    def partition(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes[0].sharding)
        x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
        s_sh = NamedSharding(mesh, PartitionSpec(baxes, None))
        repl = NamedSharding(mesh, PartitionSpec())
        n_g = 2 if need_feat else 1
        args = (x_sh, s_sh, s_sh) + (repl,) * n_w + (x_sh,) * n_g

        def lower(x, s_attn, s_mlp, *rest):
            outs = local(x, s_attn, s_mlp, *rest)
            dx, dws = outs[0], outs[1:]
            if baxes is not None:
                # per-shard partial weight grads → DDP-style all-reduce
                dws = jax.lax.psum(tuple(dws), baxes)
            return (dx,) + tuple(dws)

        return mesh, lower, out_shardings(mesh, baxes), args

    cp = custom_partitioning(local)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule=_bwd_sharding_rule(need_feat))
    _CP_CACHE[key] = cp
    return cp


def _multi_device() -> bool:
    """Route through custom_partitioning only when a mesh can exist. On a
    single-device process the direct pallas call avoids any partitioner
    involvement (identical lowering to round 2's)."""
    forced = os.environ.get("DELTAKD_FUSED_CP")
    if forced in ("0", "1"):
        return forced == "1"
    return jax.device_count() > 1


# -----------------------------------------------------------------------------
# custom-VJP wrappers (one per need_feat variant, selected by the public API)
# -----------------------------------------------------------------------------

def _make_fused_block(need_feat: bool):

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
    def fused(x, scales, ws, eps, H):
        if _multi_device():
            outs = _get_fwd_partitioned(need_feat, eps, H)(
                x, scales[0], scales[1], *ws)
        else:
            outs = _fused_block_fwd_call(x, scales[0], scales[1], ws,
                                         eps=eps, H=H, need_feat=need_feat)
        return tuple(outs) if need_feat else outs

    def fwd(x, scales, ws, eps, H):
        return fused(x, scales, ws, eps, H), (x, scales, ws)

    def bwd(eps, H, res, g):
        x, scales, ws = res
        if need_feat:
            g_out, g_feat = g
        else:
            g_out, g_feat = g, None
        if _multi_device():
            gs = (g_out, g_feat) if need_feat else (g_out,)
            outs = _get_bwd_partitioned(need_feat, eps, H)(
                x, scales[0], scales[1], *ws, *gs)
        else:
            outs = _fused_block_bwd_call(x, scales[0], scales[1], ws, g_out,
                                         g_feat, eps=eps, H=H)
        dx, dws = outs[0], outs[1:]
        dws = tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws))
        # droppath scales are non-trainable masks — zero cotangent
        return dx, (jnp.zeros_like(scales[0]), jnp.zeros_like(scales[1])), dws

    fused.defvjp(fwd, bwd)
    return fused


_fused_block_feat = _make_fused_block(True)
_fused_block_nofeat = _make_fused_block(False)


def fused_vit_block(x: jax.Array, params: Dict[str, Any], *, num_heads: int,
                    ln_eps: float = 1e-6,
                    scale_attn: Optional[jax.Array] = None,
                    scale_mlp: Optional[jax.Array] = None,
                    need_features: bool = True
                    ) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Apply one fused pre-norm ViT block.

    x: [B, N, D]; params: the Flax Block subtree (norm1/attn/norm2/mlp);
    scale_attn/scale_mlp: per-sample [B] droppath branch scales (None = 1).
    Returns (out, features) with features None when need_features=False.
    """
    B = x.shape[0]
    ones = jnp.ones((B, 1), jnp.float32)
    s_a = ones if scale_attn is None else scale_attn.reshape(B, 1).astype(jnp.float32)
    s_m = ones if scale_mlp is None else scale_mlp.reshape(B, 1).astype(jnp.float32)
    ws = _weight_arrays(params, x.dtype)
    if need_features:
        return _fused_block_feat(x, (s_a, s_m), ws, ln_eps, num_heads)
    return _fused_block_nofeat(x, (s_a, s_m), ws, ln_eps, num_heads), None


def reference_vit_block(x, params, *, num_heads, ln_eps=1e-6,
                        scale_attn=None, scale_mlp=None):
    """Pure-JAX (XLA) forward with the same fp32-accumulation structure, for
    parity tests of the kernel."""
    B = x.shape[0]
    ws = _weight_arrays(params, x.dtype)
    w = dict(zip(_W_NAMES, ws))
    s_a = jnp.ones((B,), jnp.float32) if scale_attn is None else \
        scale_attn.reshape(B).astype(jnp.float32)
    s_m = jnp.ones((B,), jnp.float32) if scale_mlp is None else \
        scale_mlp.reshape(B).astype(jnp.float32)

    def one(xb, sa, sm):
        return _block_math_fwd(xb.astype(jnp.float32), w, ln_eps, num_heads,
                               x.dtype, sa, sm)

    out, feat = jax.vmap(one)(x, s_a, s_m)
    return out.astype(x.dtype), feat.astype(x.dtype)


def use_fused_block() -> bool:
    """True when the Pallas kernel can execute: on a real TPU backend, or
    anywhere in interpret mode (set_interpret / DELTAKD_FUSED_INTERPRET=1)."""
    if not _HAS_PLTPU:
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def best_block_fn(enabled: bool = True):
    """block_fn for VisionTransformer: the fused kernel when on TPU, else None
    (the model's unfused module path).

    Callers should pass enabled=False when block weights are sharded over a
    model axis (Megatron TP): the kernel consumes full weight matrices, so the
    partitioner would insert per-step all-gathers and defeat the sharding.
    Multi-chip DATA-parallel meshes are fine — the custom_partitioning rule
    above splits the batch across chips and psums the weight grads."""
    if enabled and use_fused_block():
        return fused_vit_block
    return None


# -----------------------------------------------------------------------------
# Block-PAIR kernels: two consecutive blocks per grid step.
#
# STATUS (round 4): measured NEGATIVE at the full-model level — see the
# dead-end table above. Kept compiled+tested as the record (DELTAKD_PAIR=1
# opts in); not used by any default path.
#
# Motivation (round-4 verdict 3a, measured in benchmarks/scratch_twoblock.py,
# B=256 N=198 round-robin): the pair BACKWARD removes the mid activation's
# HBM round trip (x-read + g-read + dx-write per block -> once per pair) and
# halves kernel launches: fwd+bwd -10.1% at D=192 (tb 2), -13.2% at D=384
# (tb 1) in ISOLATION. The pair FORWARD alone is neutral at D=192 / SLOWER
# at D=384 (+4-9%: halving the chain count costs more ILP than the saved
# traffic). At the full-model level both the pair and the hybrid
# single-fwd+pair-bwd variants LOSE ~2% (benchmarks/scratch_pair_model.py).
#
# The pair backward recomputes block1 keeping its stash in VMEM
# (_block_fwd_stash(s_mlp=...) also produces the mid activation - one extra
# [N,4D]@[4D,D] matmul per pair vs two single-block backwards), recomputes
# block2 from mid, then reverses both with _block_bwd_reverse. Per-block
# KD-hook features stay per-position optional ((nf1, nf2) kernel variants).
# -----------------------------------------------------------------------------


def _pair_fwd_kernel(x_ref, sa1_ref, sm1_ref, sa2_ref, sm2_ref, *rest,
                     eps, H, nf1, nf2, tb):
    n_w = len(_W_NAMES)
    w_refs = rest[:2 * n_w]
    out_refs = rest[2 * n_w:]
    w1 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[:n_w])}
    w2 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[n_w:])}
    b = pl.program_id(0)
    for i in range(tb):
        s = b * tb + i
        x32 = x_ref[i].astype(jnp.float32)
        mid, f1 = _block_math_fwd(x32, w1, eps, H, x_ref.dtype,
                                  sa1_ref[s, 0], sm1_ref[s, 0], post_div=True)
        out, f2 = _block_math_fwd(mid, w2, eps, H, x_ref.dtype,
                                  sa2_ref[s, 0], sm2_ref[s, 0], post_div=True)
        out_refs[0][i] = out.astype(out_refs[0].dtype)
        k = 1
        if nf1:
            out_refs[k][i] = f1.astype(out_refs[k].dtype)
            k += 1
        if nf2:
            out_refs[k][i] = f2.astype(out_refs[k].dtype)


def _pair_fwd_call(x, scales, ws1, ws2, *, eps, H, nf1, nf2):
    B, N, D = x.shape
    tb = _pick_tb(B, N, D, bwd=False, pair=True)
    out_shape = [jax.ShapeDtypeStruct((B, N, D), x.dtype)]
    out_specs = [_row_spec(N, D, tb)]
    for flag in (nf1, nf2):
        if flag:
            out_shape.append(jax.ShapeDtypeStruct((B, N, D), x.dtype))
            out_specs.append(_row_spec(N, D, tb))
    flops_elem = 2 * (24 * N * D * D + 4 * N * N * D)
    return pl.pallas_call(
        functools.partial(_pair_fwd_kernel, eps=eps, H=H, nf1=nf1, nf2=nf2,
                          tb=tb),
        grid=(B // tb,),
        in_specs=([_row_spec(N, D, tb)] + [_scale_spec(B)] * 4
                  + _w_specs(ws1) + _w_specs(ws2)),
        out_specs=tuple(out_specs) if len(out_specs) > 1 else out_specs[0],
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=B * flops_elem,
            bytes_accessed=2 * B * N * D * x.dtype.itemsize
            * (1 + 1 + int(nf1) + int(nf2)),
            transcendentals=B * N * D * 10),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, *scales, *ws1, *ws2)


def _pair_bwd_kernel(x_ref, sa1_ref, sm1_ref, sa2_ref, sm2_ref, *rest,
                     eps, H, nf1, nf2, tb):
    n_w = len(_W_NAMES)
    w_refs = rest[:2 * n_w]
    pos = 2 * n_w
    g_out_ref = rest[pos]
    pos += 1
    g_f1_ref = g_f2_ref = None
    if nf1:
        g_f1_ref = rest[pos]
        pos += 1
    if nf2:
        g_f2_ref = rest[pos]
        pos += 1
    dx_ref = rest[pos]
    dw_refs = rest[pos + 1:]

    w1 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[:n_w])}
    w2 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[n_w:])}
    dtype = x_ref.dtype
    _, N, D = x_ref.shape
    hd = D // H
    scale = hd ** -0.5
    b = pl.program_id(0)

    acc = None
    for i in range(tb):
        s = b * tb + i
        x32 = x_ref[i].astype(jnp.float32)
        mid, stash1 = _block_fwd_stash(x32, w1, sa1_ref[s, 0], eps, H, D,
                                       scale, dtype, s_mlp=sm1_ref[s, 0])
        _, stash2 = _block_fwd_stash(mid, w2, sa2_ref[s, 0], eps, H, D,
                                     scale, dtype)
        g_out = g_out_ref[i].astype(jnp.float32)
        gf2 = g_f2_ref[i].astype(jnp.float32) if nf2 else None
        dmid, t2 = _block_bwd_reverse(stash2, w2, g_out, gf2, sa2_ref[s, 0],
                                      sm2_ref[s, 0], eps, H, D, hd, scale,
                                      dtype)
        gf1 = g_f1_ref[i].astype(jnp.float32) if nf1 else None
        dx, t1 = _block_bwd_reverse(stash1, w1, dmid, gf1, sa1_ref[s, 0],
                                    sm1_ref[s, 0], eps, H, D, hd, scale,
                                    dtype)
        dx_ref[i] = dx.astype(dx_ref.dtype)
        tiles = t1 + t2
        acc = tiles if acc is None else tuple(a + t for a, t in zip(acc, tiles))

    @pl.when(b == 0)
    def _():
        for r, t in zip(dw_refs, acc):
            r[...] = t

    @pl.when(b > 0)
    def _():
        for r, t in zip(dw_refs, acc):
            r[...] += t


def _pair_bwd_call(x, scales, ws1, ws2, gs, *, eps, H, nf1, nf2):
    """gs: (g_out[, g_feat1][, g_feat2]) per the nf flags. Returns
    (dx, *dws1, *dws2) with dws as per-shard PARTIAL sums."""
    B, N, D = x.shape
    tb = _pick_tb(B, N, D, bwd=True, pair=True)
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                 for w in ws1 + ws2]
    return pl.pallas_call(
        functools.partial(_pair_bwd_kernel, eps=eps, H=H, nf1=nf1, nf2=nf2,
                          tb=tb),
        grid=(B // tb,),
        in_specs=([_row_spec(N, D, tb)] + [_scale_spec(B)] * 4
                  + _w_specs(ws1) + _w_specs(ws2)
                  + [_row_spec(N, D, tb)] * len(gs)),
        out_specs=tuple([_row_spec(N, D, tb)] + _w_specs(ws1) + _w_specs(ws2)),
        out_shape=tuple([jax.ShapeDtypeStruct((B, N, D), x.dtype)]
                        + dw_shapes),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * (24 * N * D * D + 4 * N * N * D),
            bytes_accessed=4 * B * N * D * x.dtype.itemsize,
            transcendentals=B * N * D * 20),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_INTERPRET,
    )(x, *scales, *ws1, *ws2, *gs)


def _pair_feat_count(nf1, nf2):
    return 1 + int(nf1) + int(nf2)


def _pair_fwd_sharding_rule(nf1, nf2) -> SdyShardingRule:
    wmaps = tuple((f"w{i}a", f"w{i}b") for i in range(2 * len(_W_NAMES)))
    x_map = ("b", "n", "d")
    s_map = ("b", "u")
    out_maps = (x_map,) * _pair_feat_count(nf1, nf2)
    non_batch = ("n", "d", "u") + tuple(f for m in wmaps for f in m)
    return SdyShardingRule(
        operand_mappings=(x_map,) + (s_map,) * 4 + wmaps,
        result_mappings=out_maps,
        need_replication_factors=non_batch)


def _pair_bwd_sharding_rule(nf1, nf2) -> SdyShardingRule:
    wmaps = tuple((f"w{i}a", f"w{i}b") for i in range(2 * len(_W_NAMES)))
    x_map = ("b", "n", "d")
    s_map = ("b", "u")
    g_maps = (x_map,) * _pair_feat_count(nf1, nf2)
    non_batch = ("n", "d", "u") + tuple(f for m in wmaps for f in m)
    return SdyShardingRule(
        operand_mappings=(x_map,) + (s_map,) * 4 + wmaps + g_maps,
        result_mappings=(x_map,) + wmaps,
        need_replication_factors=non_batch)


def _get_pair_fwd_partitioned(nf1, nf2, eps, H):
    key = ("pair_fwd", nf1, nf2, eps, H)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    n_w = len(_W_NAMES)

    def local(x, sa1, sm1, sa2, sm2, *ws):
        return _pair_fwd_call(x, (sa1, sm1, sa2, sm2), ws[:n_w], ws[n_w:],
                              eps=eps, H=H, nf1=nf1, nf2=nf2)

    n_out = _pair_feat_count(nf1, nf2)

    def shardings(mesh, baxes):
        x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
        s_sh = NamedSharding(mesh, PartitionSpec(baxes, None))
        repl = NamedSharding(mesh, PartitionSpec())
        args = (x_sh,) + (s_sh,) * 4 + (repl,) * (2 * n_w)
        outs = (x_sh,) * n_out if n_out > 1 else x_sh
        return args, outs

    def infer(mesh, arg_shapes, result_shape):
        return shardings(mesh, _batch_axes(arg_shapes[0].sharding))[1]

    def partition(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes[0].sharding)
        args, outs = shardings(mesh, baxes)
        return mesh, local, outs, args

    cp = custom_partitioning(local)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule=_pair_fwd_sharding_rule(nf1, nf2))
    _CP_CACHE[key] = cp
    return cp


def _get_pair_bwd_partitioned(nf1, nf2, eps, H):
    key = ("pair_bwd", nf1, nf2, eps, H)
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    n_w = len(_W_NAMES)
    n_g = _pair_feat_count(nf1, nf2)

    def local(x, sa1, sm1, sa2, sm2, *rest):
        ws, gs = rest[:2 * n_w], rest[2 * n_w:]
        return _pair_bwd_call(x, (sa1, sm1, sa2, sm2), ws[:n_w], ws[n_w:],
                              gs, eps=eps, H=H, nf1=nf1, nf2=nf2)

    def out_shardings(mesh, baxes):
        x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
        repl = NamedSharding(mesh, PartitionSpec())
        return (x_sh,) + (repl,) * (2 * n_w)

    def infer(mesh, arg_shapes, result_shape):
        return out_shardings(mesh, _batch_axes(arg_shapes[0].sharding))

    def partition(mesh, arg_shapes, result_shape):
        baxes = _batch_axes(arg_shapes[0].sharding)
        x_sh = NamedSharding(mesh, PartitionSpec(baxes, None, None))
        s_sh = NamedSharding(mesh, PartitionSpec(baxes, None))
        repl = NamedSharding(mesh, PartitionSpec())
        args = ((x_sh,) + (s_sh,) * 4 + (repl,) * (2 * n_w) + (x_sh,) * n_g)

        def lower(x, sa1, sm1, sa2, sm2, *rest):
            outs = local(x, sa1, sm1, sa2, sm2, *rest)
            dx, dws = outs[0], outs[1:]
            if baxes is not None:
                dws = jax.lax.psum(tuple(dws), baxes)
            return (dx,) + tuple(dws)

        return mesh, lower, out_shardings(mesh, baxes), args

    cp = custom_partitioning(local)
    cp.def_partition(partition=partition, infer_sharding_from_operands=infer,
                     sharding_rule=_pair_bwd_sharding_rule(nf1, nf2))
    _CP_CACHE[key] = cp
    return cp


def _make_fused_pair(nf1: bool, nf2: bool):
    n_w = len(_W_NAMES)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
    def fused(x, scales, ws1, ws2, eps, H):
        if os.environ.get("DELTAKD_PAIR_HYBRID") == "1" and not _multi_device():
            # Attribution experiment (round 4): single-block FORWARD kernels
            # (tb=8 deep queue, full ILP) + the fused pair BACKWARD — isolates
            # whether the pair fwd or the pair bwd loses at model level.
            o1 = _fused_block_fwd_call(x, scales[0], scales[1], ws1,
                                       eps=eps, H=H, need_feat=nf1)
            mid, f1 = o1 if nf1 else (o1, None)
            o2 = _fused_block_fwd_call(mid, scales[2], scales[3], ws2,
                                       eps=eps, H=H, need_feat=nf2)
            out, f2 = o2 if nf2 else (o2, None)
            outs = ((out,) + ((f1,) if nf1 else ()) + ((f2,) if nf2 else ()))
            return outs if (nf1 or nf2) else out
        if _multi_device():
            outs = _get_pair_fwd_partitioned(nf1, nf2, eps, H)(
                x, *scales, *ws1, *ws2)
        else:
            outs = _pair_fwd_call(x, scales, ws1, ws2, eps=eps, H=H,
                                  nf1=nf1, nf2=nf2)
        return tuple(outs) if (nf1 or nf2) else outs

    def fwd(x, scales, ws1, ws2, eps, H):
        return fused(x, scales, ws1, ws2, eps, H), (x, scales, ws1, ws2)

    def bwd(eps, H, res, g):
        x, scales, ws1, ws2 = res
        gs = tuple(g) if (nf1 or nf2) else (g,)
        if _multi_device():
            outs = _get_pair_bwd_partitioned(nf1, nf2, eps, H)(
                x, *scales, *ws1, *ws2, *gs)
        else:
            outs = _pair_bwd_call(x, scales, ws1, ws2, gs, eps=eps, H=H,
                                  nf1=nf1, nf2=nf2)
        dx, dws = outs[0], outs[1:]
        dws = tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws1 + ws2))
        zeros = tuple(jnp.zeros_like(s) for s in scales)
        return dx, zeros, dws[:n_w], dws[n_w:]

    fused.defvjp(fwd, bwd)
    return fused


_FUSED_PAIRS = {(nf1, nf2): _make_fused_pair(nf1, nf2)
                for nf1 in (False, True) for nf2 in (False, True)}


def fused_vit_block_pair(x: jax.Array, params1: Dict[str, Any],
                         params2: Dict[str, Any], *, num_heads: int,
                         ln_eps: float = 1e-6,
                         scale_attn1: Optional[jax.Array] = None,
                         scale_mlp1: Optional[jax.Array] = None,
                         scale_attn2: Optional[jax.Array] = None,
                         scale_mlp2: Optional[jax.Array] = None,
                         need_features1: bool = True,
                         need_features2: bool = True,
                         ) -> Tuple[jax.Array, Optional[jax.Array],
                                    Optional[jax.Array]]:
    """Apply TWO consecutive fused pre-norm ViT blocks in one kernel.

    Same contract as two chained :func:`fused_vit_block` calls; returns
    (out, feat1, feat2) with feats None when not requested. Use on paths
    that BACKPROP (the pair backward is the win); fwd-only models should
    keep single blocks (see module note above)."""
    B = x.shape[0]
    ones = jnp.ones((B, 1), jnp.float32)

    def _s(v):
        return ones if v is None else v.reshape(B, 1).astype(jnp.float32)

    scales = (_s(scale_attn1), _s(scale_mlp1), _s(scale_attn2), _s(scale_mlp2))
    ws1 = _weight_arrays(params1, x.dtype)
    ws2 = _weight_arrays(params2, x.dtype)
    outs = _FUSED_PAIRS[(need_features1, need_features2)](
        x, scales, ws1, ws2, ln_eps, num_heads)
    if not (need_features1 or need_features2):
        return outs, None, None
    outs = list(outs)
    out = outs.pop(0)
    f1 = outs.pop(0) if need_features1 else None
    f2 = outs.pop(0) if need_features2 else None
    return out, f1, f2


def best_block_pair_fn(enabled: bool = True):
    """block_pair_fn for VisionTransformer: pair kernel on TPU, else None.

    Measured NEGATIVE at full-model level on v5e (see the dead-end table) —
    pass enabled=True only for explicit A/B runs (factory gates it behind
    DELTAKD_PAIR=1). Same TP caveat as best_block_fn."""
    if enabled and use_fused_block():
        return fused_vit_block_pair
    return None
