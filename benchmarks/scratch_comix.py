"""Teacher+student co-scheduled forward kernel probe (round 4).

Motivation: the two big forward kernels in the KD step have COMPLEMENTARY
bottlenecks — the DeiT-Small teacher forward runs ~58% MFU (MXU-busy), the
DeiT-Tiny student is VPU/data-pass heavy at D=192 (28% MFU fwd+bwd). TPU
cores execute one op at a time, so across two pallas_calls the idle unit of
each kernel can never soak up the other's work. But WITHIN one kernel body
Mosaic overlaps independent instruction chains (measured ~max() instead of
sum() on a bare MXU+exp probe, benchmarks/scratch_stagger.py) — so a merged
kernel running tb_t teacher chains + tb_s student chains per grid step could
hide most of the student forward under the teacher forward.

This probe times, per grid-step-equal batches:
  serial — production-shaped separate kernels (teacher tb=4, student tb=8)
  mix1   — merged kernel, 1 teacher + 1 student chain per grid step
  mix2   — merged kernel, 2 teacher + 2 student chains per grid step

If merged wins >5% at model-relevant batch, the production integration is a
custom-vjp whose forward runs the merged kernel and whose backward is the
existing student-only fused backward (the teacher is frozen; only the
student output needs gradients).

Protocol: interleaved round-robin medians (the chip throttles ~15% under
sustained load — scratch_vpu.py); correctness gated vs the serial kernels.

Usage: python benchmarks/scratch_comix.py [B] [rounds]
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

from benchmarks.bench_block import block_params, timeit
from deltakd_tpu.ops.fused_block import (_W_NAMES, _block_math_fwd, _w_specs,
                                         _weight_arrays)

N = 198
EPS = 1e-6
D_T, H_T = 384, 6
D_S, H_S = 192, 3
NW = len(_W_NAMES)


def make_single(D, H, tb):
    """Production-shaped single-model forward (scratch_stagger make_fwd)."""

    def kernel(x_ref, *rest):
        w = {name: r[...] for name, r in zip(_W_NAMES, rest[:NW])}
        out_ref = rest[NW]
        one = jnp.float32(1.0)
        for i in range(tb):
            out, _ = _block_math_fwd(x_ref[i].astype(jnp.float32), w, EPS, H,
                                     x_ref.dtype, one, one, post_div=True)
            out_ref[i] = out.astype(out_ref.dtype)

    def run(x, ws):
        B = x.shape[0]
        spec = pl.BlockSpec((tb, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[spec] + _w_specs(ws), out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, *ws)

    return run


def make_mixed(tb):
    """Merged kernel: tb teacher chains + tb student chains per grid step.

    The chains are fully independent (separate inputs, weights, outputs);
    Mosaic is free to issue one model's matmuls under the other's
    softmax/GELU passes.
    """

    def kernel(xt_ref, xs_ref, *rest):
        wt = {name: r[...] for name, r in zip(_W_NAMES, rest[:NW])}
        ws_ = {name: r[...] for name, r in zip(_W_NAMES, rest[NW:2 * NW])}
        out_t, out_s = rest[2 * NW], rest[2 * NW + 1]
        one = jnp.float32(1.0)
        for i in range(tb):
            ot, _ = _block_math_fwd(xt_ref[i].astype(jnp.float32), wt, EPS,
                                    H_T, xt_ref.dtype, one, one, post_div=True)
            out_t[i] = ot.astype(out_t.dtype)
            os_, _ = _block_math_fwd(xs_ref[i].astype(jnp.float32), ws_, EPS,
                                     H_S, xs_ref.dtype, one, one, post_div=True)
            out_s[i] = os_.astype(out_s.dtype)

    def run(xt, xs, wts, wss):
        B = xt.shape[0]
        spec_t = pl.BlockSpec((tb, N, D_T), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_s = pl.BlockSpec((tb, N, D_S), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[spec_t, spec_s] + _w_specs(wts) + _w_specs(wss),
            out_specs=(spec_t, spec_s),
            out_shape=(jax.ShapeDtypeStruct((B, N, D_T), xt.dtype),
                       jax.ShapeDtypeStruct((B, N, D_S), xs.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xt, xs, *wts, *wss)

    return run


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    # stage compiles one at a time (the tunnel wedges if a client dies
    # mid-compile, so each variant announces compile start/end)
    which = os.environ.get("COMIX_VARIANTS", "serial,mix1,mix2").split(",")

    wts = _weight_arrays(jax.tree.map(lambda a: a.astype(jnp.float32),
                                      block_params(jax.random.PRNGKey(0), D_T)),
                         jnp.bfloat16)
    wss = _weight_arrays(jax.tree.map(lambda a: a.astype(jnp.float32),
                                      block_params(jax.random.PRNGKey(1), D_S)),
                         jnp.bfloat16)
    xt = jax.random.normal(jax.random.PRNGKey(2), (B, N, D_T), jnp.bfloat16)
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, N, D_S), jnp.bfloat16)

    t_fn = make_single(D_T, H_T, 4)
    s_fn = make_single(D_S, H_S, 8)
    serial = jax.jit(lambda xt, xs: (t_fn(xt, wts), s_fn(xs, wss)))
    mixes = {tb: jax.jit(functools.partial(make_mixed(tb), wts=wts, wss=wss))
             for tb in (1, 2)}
    all_variants = {"serial": serial, "mix1": mixes[1], "mix2": mixes[2]}
    variants = [(name, all_variants[name]) for name in which]

    import time
    ref_t = ref_s = None
    for name, fn in variants:
        t0 = time.perf_counter()
        print(f"compiling {name}...", flush=True)
        got_t, got_s = fn(xt, xs)
        got_t = np.asarray(got_t, np.float32)
        got_s = np.asarray(got_s, np.float32)
        print(f"  {name} compiled+ran in {time.perf_counter()-t0:.1f}s",
              flush=True)
        if ref_t is None:
            ref_t, ref_s = got_t, got_s
        else:
            dt = np.abs(got_t - ref_t).max()
            ds = np.abs(got_s - ref_s).max()
            print(f"  {name}: max |diff| teacher {dt:.3e} student {ds:.3e}",
                  flush=True)
            assert dt < 1e-1 and ds < 1e-1, "merged kernel numerics diverge"
    times = {name: [] for name, _ in variants}
    for r in range(rounds):
        row = []
        for name, fn in variants:
            t = timeit(fn, xt, xs, steps=20)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.3f}")
        print(f"B={B} round {r}: " + " | ".join(row))

    flops = B * (24 * N * (D_T * D_T + D_S * D_S) + 4 * N * N * (D_T + D_S))
    base = sorted(times["serial"])[rounds // 2]
    for name, _ in variants:
        med = sorted(times[name])[rounds // 2]
        print(f"  {name:6s} {med*1e3:7.3f} ms ({flops/med/1e12:5.1f} TF/s) "
              f"vs serial {100*(med/base-1):+5.1f}%")


if __name__ == "__main__":
    main()
