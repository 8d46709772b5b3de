"""Interleaved A/B ablations of VPU work in the fused block forward.

The chip throttles under sustained load (~15% fwd-kernel drift within one
process, measured 2026-08-18: first-variant-in-process gets boost clocks),
so sequential one-shot comparisons lie. Protocol here: round-robin the
variants R rounds, compare WITHIN rounds, report per-variant medians.

Variants probe the exp/divide cost of softmax + GELU at the student shape
(D=192), where the kernel is VPU-bound:
  base      — production math (post_div softmax, A&S-7.1.26 erf GELU)
  sm_exp2   — scores computed in log2 domain: log2(e) folded into the
              q-scale BEFORE the [N,hd] matmul, softmax uses exp2 on the
              [N,N] scores (saves the exp lowering's per-element premul)
  gelu_exp2 — u = exp2(-log2e/2 * x^2) with the constant folded into one
              fma; erf poly consumes u as before
  both      — sm_exp2 + gelu_exp2
  erf3      — both + 3-term A&S 7.1.25 erf poly (max err 2.5e-5; only a
              candidate if the win is big — needs a numerics gate)

Usage: python benchmarks/scratch_vpu.py [B] [rounds]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deltakd_tpu.ops.fused_block import (_W_NAMES, _erf, _gelu, _ln_fwd,
                                         _w_specs, _weight_arrays,
                                         _INV_SQRT2)
from benchmarks.bench_block import block_params, timeit

N, D, H = 198, 192, 3
EPS = 1e-6
LOG2E = 1.4426950408889634


def _gelu_exp2(x):
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    u = jnp.exp2(x * x * (-0.5 * LOG2E))
    xs = x * _INV_SQRT2
    sign = jnp.sign(xs)
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    erf = sign * (1.0 - poly * u)
    return 0.5 * x * (1.0 + erf)


def _gelu_erf3(x):
    # A&S 7.1.25: 3-term, max abs err 2.5e-5
    a1, a2, a3 = 0.3480242, -0.0958798, 0.7478556
    p = 0.47047
    u = jnp.exp2(x * x * (-0.5 * LOG2E))
    xs = x * _INV_SQRT2
    sign = jnp.sign(xs)
    ax = jnp.abs(xs)
    t = 1.0 / (1.0 + p * ax)
    poly = ((a3 * t + a2) * t + a1) * t
    erf = sign * (1.0 - poly * u)
    return 0.5 * x * (1.0 + erf)


def _fwd_variant(x32, w, dtype, *, sm_exp2, gelu_fn):
    scale = (D // H) ** -0.5
    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], EPS)
    qkv = jax.lax.dot_general(y.astype(dtype), w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    hd = D // H
    qscale = scale * LOG2E if sm_exp2 else scale
    expfn = jnp.exp2 if sm_exp2 else jnp.exp
    outs = []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general((q * qscale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = expfn(s)
        o = jax.lax.dot_general(e.astype(dtype), v.astype(dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o / jnp.sum(e, axis=-1, keepdims=True))
    merged = jnp.concatenate(outs, axis=-1)
    attn = jax.lax.dot_general(merged.astype(dtype), w["wproj"],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + attn
    z, _, _ = _ln_fwd(x2, w["g2"], w["b2"], EPS)
    hpre = jax.lax.dot_general(z.astype(dtype), w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    h_ = gelu_fn(hpre)
    feat = jax.lax.dot_general(h_.astype(dtype), w["w2"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf2"]
    return x2 + feat


def make_fwd(sm_exp2, gelu_fn):
    def kernel(x_ref, *rest):
        w_refs = rest[:len(_W_NAMES)]
        out_ref = rest[len(_W_NAMES)]
        w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
        x32 = x_ref[0].astype(jnp.float32)
        out = _fwd_variant(x32, w, x_ref.dtype, sm_exp2=sm_exp2,
                           gelu_fn=gelu_fn)
        out_ref[0] = out.astype(out_ref.dtype)

    def run(x, ws):
        B = x.shape[0]
        spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[spec] + _w_specs(ws),
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *ws)

    return jax.jit(run)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws = _weight_arrays(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    flops = B * (24 * N * D * D + 4 * N * N * D)

    variants = [
        ("base", make_fwd(False, _gelu)),
        ("sm_exp2", make_fwd(True, _gelu)),
        ("gelu_exp2", make_fwd(False, _gelu_exp2)),
        ("both", make_fwd(True, _gelu_exp2)),
        ("erf3", make_fwd(True, _gelu_erf3)),
    ]
    # compile + numerics check vs base first
    ref = np.asarray(variants[0][1](x, ws), np.float32)
    for name, fn in variants[1:]:
        got = np.asarray(fn(x, ws), np.float32)
        print(f"{name}: max |diff| vs base = {np.abs(got - ref).max():.3e}")

    times = {name: [] for name, _ in variants}
    for r in range(rounds):
        row = []
        for name, fn in variants:
            t = timeit(fn, x, ws, steps=20)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.3f}")
        print(f"round {r}: " + " | ".join(row))
    print("\nmedians:")
    base_med = sorted(times["base"])[len(times["base"]) // 2]
    for name, _ in variants:
        med = sorted(times[name])[len(times[name]) // 2]
        print(f"  {name:10s} {med*1e3:7.3f} ms ({flops/med/1e12:5.1f} TF/s) "
              f"vs base {100*(med/base_med-1):+5.1f}%")


if __name__ == "__main__":
    main()
