"""Polynomial transcendental ablation for the fused block forward.

The student-shape kernel (D=192) is VPU-bound and the VPU phases serialize
with the MXU inside an element's dependency chain, so every exp/divide op
lowered as a long scalar sequence is on the critical path. Since every
transcendental's output feeds a bf16 matmul, bf16-level accuracy suffices:

  poly-GELU  — erf(x) ~ clamp(x * P8(x^2)) on |x|<=3.7 (Chebyshev fit,
               gelu rel err 5e-4, 8x below bf16 ulp): kills exp AND the
               reciprocal from GELU; derivative is also a polynomial.
  exp2-scalb — softmax numerators via t = s*log2(e) - m (log2e folded into
               the q scale), i = floor(t), 2^t = bitcast((i+127)<<23) *
               P4(t-i) (rel err 7e-6): replaces the libm-accurate exp.

Interleaved protocol per scratch_vpu.py (the chip throttles ~15% under
sustained load). Findings feed ops/fused_block.py.

Usage: python benchmarks/scratch_poly.py [B] [rounds]
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

from deltakd_tpu.ops.fused_block import (_W_NAMES, _gelu, _ln_fwd, _w_specs,
                                         _weight_arrays, _INV_SQRT2)
from benchmarks.bench_block import block_params, timeit

N, D, H = 198, 192, 3
EPS = 1e-6
LOG2E = 1.4426950408889634

# erf(x)/x as P(x^2) on [0, 3.7^2], Chebyshev deg-8 (gelu rel err 5e-4)
_ERF_P = (1.1279358937e+00, -3.7296019302e-01, 1.0717179867e-01,
          -2.2402476807e-02, 3.2799594005e-03, -3.2265468501e-04,
          2.0091153859e-05, -7.1040299377e-07, 1.0818625606e-08)
# 2^f on [0,1), deg-4 (rel err 7e-6)
_EXP2_P = (1.0000072833e+00, 6.9293128916e-01, 2.4171026247e-01,
           5.1666877431e-02, 1.3676531088e-02)
_ERF_B = 3.7


def _horner(u, coeffs):
    acc = jnp.full_like(u, coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * u + c
    return acc


def gelu_poly(x):
    xe = jnp.clip(x * _INV_SQRT2, -_ERF_B, _ERF_B)
    u = xe * xe
    erf = jnp.clip(xe * _horner(u, _ERF_P), -1.0, 1.0)
    return 0.5 * x * (1.0 + erf)


def exp2_cheap(t):
    """2^t for t <= 0 (softmax-shifted scores), bf16-grade accuracy."""
    t = jnp.maximum(t, -126.0)
    i = jnp.floor(t)
    f = t - i
    p = _horner(f, _EXP2_P)
    bits = (i.astype(jnp.int32) + 127) << 23
    return jax.lax.bitcast_convert_type(bits, jnp.float32) * p


def _fwd_variant(x32, w, dtype, *, gelu_fn, sm_cheap):
    scale = (D // H) ** -0.5
    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], EPS)
    qkv = jax.lax.dot_general(y.astype(dtype), w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    hd = D // H
    qscale = scale * LOG2E if sm_cheap else scale
    outs = []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general((q * qscale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = exp2_cheap(s) if sm_cheap else jnp.exp(s)
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


def make_fwd(gelu_fn, sm_cheap):
    def kernel(x_ref, *rest):
        w_refs = rest[:len(_W_NAMES)]
        out_ref = rest[len(_W_NAMES)]
        w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
        x32 = x_ref[0].astype(jnp.float32)
        out = _fwd_variant(x32, w, x_ref.dtype, gelu_fn=gelu_fn,
                           sm_cheap=sm_cheap)
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
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws = _weight_arrays(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    flops = B * (24 * N * D * D + 4 * N * N * D)

    variants = [
        ("base", make_fwd(_gelu, False)),
        ("poly_gelu", make_fwd(gelu_poly, False)),
        ("cheap_sm", make_fwd(_gelu, True)),
        ("both", make_fwd(gelu_poly, True)),
    ]
    ref = np.asarray(variants[0][1](x, ws), np.float32)
    scale = np.abs(ref).max()
    for name, fn in variants[1:]:
        got = np.asarray(fn(x, ws), np.float32)
        print(f"{name}: max|diff| {np.abs(got-ref).max():.3e} "
              f"(rel-of-max {np.abs(got-ref).max()/scale:.2e})")

    times = {name: [] for name, _ in variants}
    for r in range(rounds):
        row = []
        for name, fn in variants:
            t = timeit(fn, x, ws, steps=30)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.3f}")
        print(f"round {r}: " + " | ".join(row))
    print("\nmedians:")
    base_med = sorted(times["base"])[rounds // 2]
    for name, _ in variants:
        med = sorted(times[name])[rounds // 2]
        print(f"  {name:10s} {med*1e3:7.3f} ms ({flops/med/1e12:5.1f} TF/s) "
              f"vs base {100*(med/base_med-1):+5.1f}%")


if __name__ == "__main__":
    main()
