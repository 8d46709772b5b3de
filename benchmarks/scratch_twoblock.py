"""Two-consecutive-blocks-per-kernel fusion ablation (round-4 verdict 3a).

Hypothesis: the fused block's remaining HBM traffic is the per-block
[B, N, D] x-read/out-write (fwd) and x-read/g-read/dx-write (bwd). Fusing
TWO consecutive blocks into one grid step removes the intermediate
activation round trip — per block pair: fwd 4 tensor passes -> 2, bwd
6 passes -> 3 — plus halves the pallas_call count (kernel launch + grid
prologue/epilogue overhead).

Mechanics: the pair backward recomputes block1 keeping its stash in VMEM
(`_block_fwd_stash(s_mlp=...)` computes the block output too — one extra
[N,4D]@[4D,D] matmul per pair vs the single-block backward), recomputes
block2 from the mid activation, then reverses block2 and block1 in sequence
(`_block_bwd_reverse`). Zero extra recompute otherwise. VMEM: two stashes
live per chain (~4.4 MB at D=192) so the chain count tb drops vs the
single-block kernel (4 -> 1..2 bwd).

Protocol: interleaved round-robin medians (the chip throttles ~15% under
sustained load — scratch_vpu.py); correctness vs the chained production
kernel checked first.

Usage: python benchmarks/scratch_twoblock.py [B] [rounds]
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

from deltakd_tpu.ops.fused_block import (_W_NAMES, _block_bwd_reverse,
                                         _block_fwd_stash, _block_math_fwd,
                                         _w_specs, _weight_arrays,
                                         fused_vit_block)
from benchmarks.bench_block import block_params, timeit

N = 198
EPS = 1e-6
NW = len(_W_NAMES)
_INTERPRET = os.environ.get("DELTAKD_FUSED_INTERPRET") == "1"


def _row_spec(n, d, tb):
    return pl.BlockSpec((tb, n, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def make_pair_fwd(D, H, tb):
    def kernel(x_ref, *rest):
        w_refs = rest[:2 * NW]
        out_ref = rest[2 * NW]
        w1 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[:NW])}
        w2 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[NW:])}
        one = jnp.float32(1.0)
        for i in range(tb):
            x32 = x_ref[i].astype(jnp.float32)
            mid, _ = _block_math_fwd(x32, w1, EPS, H, x_ref.dtype, one, one,
                                     post_div=True)
            out, _ = _block_math_fwd(mid, w2, EPS, H, x_ref.dtype, one, one,
                                     post_div=True)
            out_ref[i] = out.astype(out_ref.dtype)

    def run(x, ws1, ws2):
        B = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[_row_spec(N, D, tb)] + _w_specs(ws1) + _w_specs(ws2),
            out_specs=_row_spec(N, D, tb),
            out_shape=jax.ShapeDtypeStruct((B, N, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x, *ws1, *ws2)

    return run


def make_pair_bwd(D, H, tb):
    hd = D // H
    scale = hd ** -0.5

    def kernel(x_ref, *rest):
        w_refs = rest[:2 * NW]
        g_ref = rest[2 * NW]
        dx_ref = rest[2 * NW + 1]
        dw_refs = rest[2 * NW + 2:]
        w1 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[:NW])}
        w2 = {k: r[...] for k, r in zip(_W_NAMES, w_refs[NW:])}
        one = jnp.float32(1.0)
        b = pl.program_id(0)
        dtype = x_ref.dtype
        acc = None
        for i in range(tb):
            x32 = x_ref[i].astype(jnp.float32)
            mid, stash1 = _block_fwd_stash(x32, w1, one, EPS, H, D, scale,
                                           dtype, s_mlp=one)
            _, stash2 = _block_fwd_stash(mid, w2, one, EPS, H, D, scale,
                                         dtype)
            g = g_ref[i].astype(jnp.float32)
            dmid, t2 = _block_bwd_reverse(stash2, w2, g, None, one, one,
                                          EPS, H, D, hd, scale, dtype)
            dx, t1 = _block_bwd_reverse(stash1, w1, dmid, None, one, one,
                                        EPS, H, D, hd, scale, dtype)
            dx_ref[i] = dx.astype(dx_ref.dtype)
            tiles = t1 + t2
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

    def run(x, ws1, ws2, g):
        B = x.shape[0]
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                     for w in ws1 + ws2]
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=([_row_spec(N, D, tb)] + _w_specs(ws1) + _w_specs(ws2)
                      + [_row_spec(N, D, tb)]),
            out_specs=tuple([_row_spec(N, D, tb)]
                            + _w_specs(ws1) + _w_specs(ws2)),
            out_shape=tuple([jax.ShapeDtypeStruct((B, N, D), x.dtype)]
                            + dw_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(x, *ws1, *ws2, g)

    return run


def make_pair(D, H, tb_fwd, tb_bwd):
    fwd_call = make_pair_fwd(D, H, tb_fwd)
    bwd_call = make_pair_bwd(D, H, tb_bwd)

    @jax.custom_vjp
    def pair(x, ws1, ws2):
        return fwd_call(x, ws1, ws2)

    def fwd(x, ws1, ws2):
        return fwd_call(x, ws1, ws2), (x, ws1, ws2)

    def bwd(res, g):
        x, ws1, ws2 = res
        outs = bwd_call(x, ws1, ws2, g)
        dx, dws = outs[0], outs[1:]
        dws = tuple(dw.astype(w.dtype) for dw, w in zip(dws, ws1 + ws2))
        return dx, dws[:NW], dws[NW:]

    pair.defvjp(fwd, bwd)
    return pair


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    results = {}
    for label, D, H in (("student D=192", 192, 3), ("teacher D=384", 384, 6)):
        key = jax.random.PRNGKey(0)
        p1 = block_params(key, D)
        p2 = block_params(jax.random.PRNGKey(1), D)
        x = (jax.random.normal(jax.random.PRNGKey(2), (B, N, D)) * 0.5
             ).astype(jnp.bfloat16)
        ws1 = _weight_arrays(jax.tree.map(jnp.asarray, p1), jnp.bfloat16)
        ws2 = _weight_arrays(jax.tree.map(jnp.asarray, p2), jnp.bfloat16)

        def loss_base(x, p1, p2):
            y, _ = fused_vit_block(x, p1, num_heads=H, need_features=False)
            z, _ = fused_vit_block(y, p2, num_heads=H, need_features=False)
            return jnp.sum(z.astype(jnp.float32))

        base_fwd = jax.jit(lambda x: loss_base(x, p1, p2))
        base_grad = jax.jit(jax.grad(loss_base, argnums=(0, 1, 2)))

        variants_fwd = {"base": base_fwd}
        variants_grad = {"base": lambda x: base_grad(x, p1, p2)}
        tb_fwd_opts = (8, 4) if D == 192 else (4, 2)
        tb_bwd_opts = (2, 1)
        pair_01 = None
        for tbf in tb_fwd_opts:
            if B % tbf:
                continue
            f = make_pair_fwd(D, H, tbf)
            variants_fwd[f"pair tbf={tbf}"] = jax.jit(
                lambda x, f=f: jnp.sum(f(x, ws1, ws2).astype(jnp.float32)))
        for tbb in tb_bwd_opts:
            if B % tbb:
                continue
            pair = make_pair(D, H, tb_fwd_opts[0], tbb)
            if pair_01 is None:
                pair_01 = pair

            def loss_pair(x, ws1, ws2, pair=pair):
                return jnp.sum(pair(x, ws1, ws2).astype(jnp.float32))

            variants_grad[f"pair tbb={tbb}"] = jax.jit(
                lambda x, lp=loss_pair: jax.grad(lp, argnums=(0, 1, 2))(
                    x, ws1, ws2))

        # ---- correctness vs the chained production kernel
        out_base = jax.jit(
            lambda x: fused_vit_block(
                fused_vit_block(x, p1, num_heads=H, need_features=False)[0],
                p2, num_heads=H, need_features=False)[0])(x)
        out_pair = jax.jit(
            lambda x: make_pair_fwd(D, H, tb_fwd_opts[0])(x, ws1, ws2))(x)
        err = float(jnp.max(jnp.abs(out_base.astype(jnp.float32)
                                    - out_pair.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(out_base.astype(jnp.float32)))) or 1.0
        print(f"{label}: pair fwd max abs err {err:.3e} (ref magnitude {ref:.2f})")
        assert err / ref < 2e-2, "pair forward mismatch"

        gb = base_grad(x, p1, p2)
        gp = jax.jit(jax.grad(
            lambda x, w1, w2: jnp.sum(pair_01(x, w1, w2).astype(jnp.float32)),
            argnums=(0, 1, 2)))(x, ws1, ws2)
        dx_err = float(jnp.max(jnp.abs(gb[0].astype(jnp.float32)
                                       - gp[0].astype(jnp.float32))))
        dx_ref = float(jnp.max(jnp.abs(gb[0].astype(jnp.float32)))) or 1.0
        print(f"{label}: pair bwd dx max abs err {dx_err:.3e} "
              f"(ref magnitude {dx_ref:.2f})")
        assert dx_err / dx_ref < 2e-2, "pair backward dx mismatch"

        # ---- interleaved timing
        for phase, variants in (("fwd", variants_fwd), ("fwd+bwd", variants_grad)):
            times = {k: [] for k in variants}
            for _ in range(rounds):
                for k, fn in variants.items():
                    times[k].append(timeit(fn, x, steps=10, warmup=2))
            print(f"  {label} {phase} (B={B}):")
            base_t = float(np.median(times["base"]))
            for k, ts in times.items():
                t = float(np.median(ts))
                results[(label, phase, k)] = t
                note = "" if k == "base" else f"  ({(t / base_t - 1) * 100:+.1f}%)"
                print(f"    {k:<14} {t * 1e3:7.3f} ms{note}")
    return results


if __name__ == "__main__":
    main()
