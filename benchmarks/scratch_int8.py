"""int8 ablation for the TEACHER's fused block forward (D=384).

The teacher forward is frozen and gradient-free, and v5e's MXU runs
s8 x s8 -> s32 at 2x the bf16 rate. The 4 weight matmuls (qkv, proj, fc1,
fc2) carry ~92% of a block's FLOPs; attention's act x act matmuls stay
bf16. Quantization scheme (standard symmetric int8, AQT-style):

  weights     per-output-channel scale (absmax/127 over K), quantized in
              XLA once per step from the bf16 params (cheap: one pass over
              21M weights) — checkpoints / params stay bf16.
  activations per-row (per-token) dynamic scale, computed in-kernel right
              after the producing op; dequant is one fma folding
              rowscale x colscale into the existing bias-add pass.

This file measures (a) a bare s8 dot vs bf16 dot at teacher shapes in
Mosaic, (b) the full fused-forward block at D=384: production bf16 vs
int8-weight-matmul variant (including all quant/dequant overhead), with
the interleaved protocol (scratch_vpu.py: the chip throttles ~15% under
sustained load), and (c) output error vs the fp32 reference math.

Usage: python benchmarks/scratch_int8.py [B] [rounds]
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
                                         _weight_arrays)
from benchmarks.bench_block import block_params, timeit

N, H = 198, 6
D = 384
EPS = 1e-6


# -----------------------------------------------------------------------------
# (a) bare dot microbench
# -----------------------------------------------------------------------------

def make_dot(dtype, K, M):
    def kernel(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if dtype == jnp.int8 else jnp.float32)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (x.shape[0], M), jnp.int32 if dtype == jnp.int8 else jnp.float32),
        )(x, w)

    return run


def bench_bare_dots(rounds):
    print("== bare dot, [1536, K] @ [K, M] ==")
    for (K, M) in [(384, 1536), (1536, 384), (384, 1152)]:
        shapes = {}
        for name, dt in [("bf16", jnp.bfloat16), ("s8", jnp.int8)]:
            kx = jax.random.PRNGKey(0)
            if dt == jnp.int8:
                x = jax.random.randint(kx, (1536, K), -127, 127, jnp.int8)
                w = jax.random.randint(kx, (K, M), -127, 127, jnp.int8)
            else:
                x = jax.random.normal(kx, (1536, K), dt)
                w = jax.random.normal(kx, (K, M), dt)
            shapes[name] = (make_dot(dt, K, M), x, w)
        times = {n: [] for n in shapes}
        for _ in range(rounds):
            for n, (f, x, w) in shapes.items():
                times[n].append(timeit(f, x, w, steps=50))
        med = {n: sorted(t)[rounds // 2] for n, t in times.items()}
        fl = 2 * 1536 * K * M
        print(f"  K={K:5d} M={M:5d}: bf16 {med['bf16']*1e6:7.1f} us "
              f"({fl/med['bf16']/1e12:6.1f} TF/s) | s8 {med['s8']*1e6:7.1f} us "
              f"({fl/med['s8']/1e12:6.1f} TOP/s) | speedup "
              f"{med['bf16']/med['s8']:.2f}x")


# -----------------------------------------------------------------------------
# (b) fused block forward: bf16 vs int8 weight matmuls
# -----------------------------------------------------------------------------

def _quant_rows(y):
    """[N, K] f32 -> (int8 values, [N, 1] f32 dequant scale)."""
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quant_weight_cols(w32):
    """[K, M] f32 -> (int8 values, [1, M] f32 dequant scale). Done in XLA."""
    amax = jnp.max(jnp.abs(w32), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dot_s8(yq, wq):
    return jax.lax.dot_general(yq, wq, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _fwd_int8(x32, w, dtype):
    """Block forward with int8 qkv/proj/fc1/fc2; attention stays bf16."""
    scale = (D // H) ** -0.5
    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], EPS)
    yq, ys = _quant_rows(y)
    qkv = _dot_s8(yq, w["wqkv"]).astype(jnp.float32) * (ys * w["sqkv"]) + w["bqkv"]
    hd = D // H
    outs = []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general((q * scale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        o = jax.lax.dot_general(e.astype(dtype), v.astype(dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o / jnp.sum(e, axis=-1, keepdims=True))
    merged = jnp.concatenate(outs, axis=-1)
    mq, ms = _quant_rows(merged)
    attn = _dot_s8(mq, w["wproj"]).astype(jnp.float32) * (ms * w["sproj"]) + w["bproj"]
    x2 = x32 + attn
    z, _, _ = _ln_fwd(x2, w["g2"], w["b2"], EPS)
    zq, zs = _quant_rows(z)
    hpre = _dot_s8(zq, w["w1"]).astype(jnp.float32) * (zs * w["s1"]) + w["bf1"]
    h_ = _gelu(hpre)
    hq, hs = _quant_rows(h_)
    feat = _dot_s8(hq, w["w2"]).astype(jnp.float32) * (hs * w["s2"]) + w["bf2"]
    return x2 + feat


def _fwd_bf16(x32, w, dtype):
    """Production-math forward (mirror of _block_math_fwd, no droppath)."""
    scale = (D // H) ** -0.5
    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], EPS)
    qkv = jax.lax.dot_general(y.astype(dtype), w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    hd = D // H
    outs = []
    for h in range(H):
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, D + h * hd:D + (h + 1) * hd]
        v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd]
        s = jax.lax.dot_general((q * scale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
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
    h_ = _gelu(hpre)
    feat = jax.lax.dot_general(h_.astype(dtype), w["w2"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf2"]
    return x2 + feat


_INT8_W = ["wqkv", "sqkv", "wproj", "sproj", "w1", "s1", "w2", "s2",
           "bqkv", "bproj", "bf1", "bf2", "g1", "b1", "g2", "b2"]


def int8_weight_arrays(params):
    """Quantize the 4 weight matmuls of one block (XLA side)."""
    ws = dict(zip(_W_NAMES, _weight_arrays(params, jnp.float32)))
    out = {}
    for name in ["wqkv", "wproj", "w1", "w2"]:
        q, s = quant_weight_cols(ws[name].astype(jnp.float32))
        out[name] = q
        out["s" + {"wqkv": "qkv", "wproj": "proj", "w1": "1", "w2": "2"}[name]] = s
    for name in ["bqkv", "bproj", "bf1", "bf2", "g1", "b1", "g2", "b2"]:
        out[name] = ws[name]
    return [out[n] for n in _INT8_W]


def make_block_fwd(variant):
    names = _W_NAMES if variant == "bf16" else _INT8_W
    fwd = _fwd_bf16 if variant == "bf16" else _fwd_int8

    def kernel(x_ref, *rest):
        w_refs = rest[:len(names)]
        out_ref = rest[len(names)]
        w = {name: r[...] for name, r in zip(names, w_refs)}
        x32 = x_ref[0].astype(jnp.float32)
        out = fwd(x32, w, jnp.bfloat16)
        out_ref[0] = out.astype(out_ref.dtype)

    def run(x, ws):
        B = x.shape[0]
        spec = pl.BlockSpec((1, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ws]
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[spec] + wspecs,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, *ws)

    return jax.jit(run)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    bench_bare_dots(rounds)

    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws_bf = _weight_arrays(params, jnp.bfloat16)
    ws_q = jax.jit(int8_weight_arrays)(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16) * 0.5

    f_bf = make_block_fwd("bf16")
    f_q = make_block_fwd("int8")

    ref = np.asarray(f_bf(x, ws_bf), np.float32)
    got = np.asarray(f_q(x, ws_q), np.float32)
    scale = np.abs(ref).max()
    rel = np.abs(got - ref).max() / scale
    print(f"\n== block fwd D={D} B={B} ==")
    print(f"int8 vs bf16: max|diff| {np.abs(got-ref).max():.3e} "
          f"(rel-of-max {rel:.2e})")

    flops = B * (24 * N * D * D + 4 * N * N * D)
    times = {"bf16": [], "int8": []}
    for r in range(rounds):
        row = []
        for name, fn, ws in [("bf16", f_bf, ws_bf), ("int8", f_q, ws_q)]:
            t = timeit(fn, x, ws, steps=30)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.3f}")
        print(f"round {r}: " + " | ".join(row))
    print("medians:")
    for name in times:
        med = sorted(times[name])[rounds // 2]
        print(f"  {name:5s} {med*1e3:7.3f} ms ({flops/med/1e12:5.1f} TF/s)")


if __name__ == "__main__":
    main()
