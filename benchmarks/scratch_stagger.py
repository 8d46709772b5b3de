"""ILP phase-stagger ablation for the fused block kernel.

A bare-metal probe (round 3) showed Mosaic overlaps INDEPENDENT MXU and VPU
instruction chains within one kernel body: a kernel running an 8-deep matmul
chain plus an independent 48-deep exp chain executes in ~max(t_mxu, t_vpu),
not the sum. The production fused block kernel is a single serial
MXU->VPU->MXU->... dependency chain per grid step (~3.9 us MXU + ~3.5 us VPU
per teacher element), so if two batch elements are processed per grid step as
two SEPARATE chains (not a batched TB=2 op chain — that was measured slower
in round 2, commit 2ad2f5c), the scheduler can run element A's matmuls under
element B's softmax/GELU and vice versa, collapsing the sum toward max().

Variants (forward, student D=192 and teacher D=384 shapes):
  base  — production TB=1 kernel (one element per grid step)
  dual  — TB=2, two independent `_block_math_fwd` chains per grid step

Protocol: interleaved round-robin medians (scratch_vpu.py — the chip
throttles ~15% under sustained load, so compare within rounds).

Usage: python benchmarks/scratch_stagger.py [B] [rounds]
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

from deltakd_tpu.ops.fused_block import (_W_NAMES, _block_math_fwd, _w_specs,
                                         _weight_arrays)
from benchmarks.bench_block import block_params, timeit

N = 198
EPS = 1e-6


def make_fwd(D, H, tb):
    def kernel(x_ref, *rest):
        w_refs = rest[:len(_W_NAMES)]
        out_ref = rest[len(_W_NAMES)]
        w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
        one = jnp.float32(1.0)
        # tb independent chains; Mosaic's scheduler may overlap their
        # MXU and VPU phases (they share only the weight refs).
        for i in range(tb):
            x32 = x_ref[i].astype(jnp.float32)
            out, _ = _block_math_fwd(x32, w, EPS, H, x_ref.dtype, one, one,
                                     post_div=True)
            out_ref[i] = out.astype(out_ref.dtype)

    def run(x, ws):
        B = x.shape[0]
        spec = pl.BlockSpec((tb, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
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

    for label, D, H in (("student D=192", 192, 3), ("teacher D=384", 384, 6)):
        params = jax.tree.map(lambda a: a.astype(jnp.float32),
                              block_params(jax.random.PRNGKey(0), D))
        ws = _weight_arrays(params, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
        flops = B * (24 * N * D * D + 4 * N * N * D)

        variants = [
            ("base", make_fwd(D, H, 1)),
            ("dual", make_fwd(D, H, 2)),
            ("quad", make_fwd(D, H, 4)),
        ]
        ref = np.asarray(variants[0][1](x, ws), np.float32)
        for name, fn in variants[1:]:
            got = np.asarray(fn(x, ws), np.float32)
            print(f"{label} {name}: max |diff| vs base = "
                  f"{np.abs(got - ref).max():.3e}")

        times = {name: [] for name, _ in variants}
        for r in range(rounds):
            row = []
            for name, fn in variants:
                t = timeit(fn, x, ws, steps=20)
                times[name].append(t)
                row.append(f"{name} {t*1e3:6.3f}")
            print(f"{label} round {r}: " + " | ".join(row))

        base_med = sorted(times["base"])[rounds // 2]
        for name, _ in variants:
            med = sorted(times[name])[rounds // 2]
            print(f"  {label} {name:5s} {med*1e3:7.3f} ms "
                  f"({flops/med/1e12:5.1f} TF/s) "
                  f"vs base {100*(med/base_med-1):+5.1f}%")


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "bwd"):
    main()


# -----------------------------------------------------------------------------
# Backward (student shape only — the teacher is frozen): tb independent
# recompute+backprop chains per grid step, weight-grad tiles summed across
# the chains then accumulated across the sequential grid as in production.
# -----------------------------------------------------------------------------

from deltakd_tpu.ops.fused_block import (_attention_bwd_one,
                                         _attention_fwd_stash,
                                         _gelu_and_grad, _ln_bwd, _ln_fwd)


def _bwd_one_elem(x32, g_out, g_feat_extra, w, D, H, dtype):
    hd = D // H
    scale = hd ** -0.5
    y, xhat1, rstd1 = _ln_fwd(x32, w["g1"], w["b1"], EPS)
    y_lp = y.astype(dtype)
    qkv = jax.lax.dot_general(y_lp, w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    merged, att_es, att_rss = _attention_fwd_stash(qkv, D, H, scale, dtype)
    merged_lp = merged.astype(dtype)
    attn = jax.lax.dot_general(merged_lp, w["wproj"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + attn
    z, xhat2, rstd2 = _ln_fwd(x2, w["g2"], w["b2"], EPS)
    z_lp = z.astype(dtype)
    hpre = jax.lax.dot_general(z_lp, w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    h, hgrad = _gelu_and_grad(hpre)
    h_lp = h.astype(dtype)

    g_feat = g_out + g_feat_extra
    g_feat_lp = g_feat.astype(dtype)
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

    dattn = dx2
    dattn_lp = dattn.astype(dtype)
    dwproj = jax.lax.dot_general(merged_lp, dattn_lp, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(dattn, axis=0, keepdims=True)
    dmerged = jax.lax.dot_general(dattn_lp, w["wproj"], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dqkv = _attention_bwd_one(qkv, dmerged, att_es, att_rss, D, H, hd, scale,
                              dtype)
    dqkv_lp = dqkv.astype(dtype)
    dwqkv = jax.lax.dot_general(y_lp, dqkv_lp, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)
    dy = jax.lax.dot_general(dqkv_lp, w["wqkv"], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ln, dg1_rows, db1_rows = _ln_bwd(dy, xhat1, rstd1, w["g1"])
    dg1 = jnp.sum(dg1_rows, axis=0, keepdims=True)
    db1 = jnp.sum(db1_rows, axis=0, keepdims=True)
    dx = dx2 + dx_ln
    tiles = (dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2, db2,
             dw1, dbf1, dw2, dbf2)
    return dx, tiles


def make_bwd(D, H, tb):
    def kernel(x_ref, *rest):
        n_w = len(_W_NAMES)
        w_refs = rest[:n_w]
        g_out_ref, g_feat_ref = rest[n_w], rest[n_w + 1]
        dx_ref = rest[n_w + 2]
        dw_refs = rest[n_w + 3:]
        w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
        dtype = x_ref.dtype
        b = pl.program_id(0)

        acc = None
        for i in range(tb):
            dx, tiles = _bwd_one_elem(x_ref[i].astype(jnp.float32),
                                      g_out_ref[i].astype(jnp.float32),
                                      g_feat_ref[i].astype(jnp.float32),
                                      w, D, H, dtype)
            dx_ref[i] = dx.astype(dx_ref.dtype)
            acc = tiles if acc is None else tuple(
                a + t for a, t in zip(acc, tiles))

        @pl.when(b == 0)
        def _():
            for r, t in zip(dw_refs, acc):
                r[...] = t

        @pl.when(b > 0)
        def _():
            for r, t in zip(dw_refs, acc):
                r[...] += t

    def run(x, ws, g_out, g_feat):
        B = x.shape[0]
        spec = pl.BlockSpec((tb, N, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        return pl.pallas_call(
            kernel,
            grid=(B // tb,),
            in_specs=[spec] + _w_specs(ws) + [spec, spec],
            out_specs=tuple([spec] + _w_specs(ws)),
            out_shape=tuple([jax.ShapeDtypeStruct((B, N, D), x.dtype)]
                            + dw_shapes),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(x, *ws, g_out, g_feat)

    return jax.jit(run)


def main_bwd():
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    D, H = 192, 3
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws = _weight_arrays(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    g_out = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.bfloat16)
    g_feat = jax.random.normal(jax.random.PRNGKey(3), (B, N, D), jnp.bfloat16)

    variants = [("base", make_bwd(D, H, 1)), ("dual", make_bwd(D, H, 2)),
                ("quad", make_bwd(D, H, 4))]
    ref = variants[0][1](x, ws, g_out, g_feat)
    for name, fn in variants[1:]:
        got = fn(x, ws, g_out, g_feat)
        d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b_.astype(jnp.float32))))
                for a, b_ in zip(jax.tree.leaves(got), jax.tree.leaves(ref)))
        print(f"bwd {name}: max |diff| vs base = {d:.3e}")

    times = {name: [] for name, _ in variants}
    for r in range(rounds):
        row = []
        for name, fn in variants:
            t = timeit(fn, x, ws, g_out, g_feat, steps=20)
            times[name].append(t)
            row.append(f"{name} {t*1e3:6.3f}")
        print(f"bwd round {r}: " + " | ".join(row))
    base_med = sorted(times["base"])[rounds // 2]
    for name, _ in variants:
        med = sorted(times[name])[rounds // 2]
        print(f"  bwd {name:5s} {med*1e3:7.3f} ms vs base "
              f"{100*(med/base_med-1):+5.1f}%")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "bwd":
    main_bwd()
