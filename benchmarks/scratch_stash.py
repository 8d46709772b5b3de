"""Prototype: stash-residual fused-block backward vs production recompute.

The production backward recomputes the whole forward per grid step (~0.75 ms
of the 3.5 ms/block at D=192, B=256) because flash-style recompute was the
round-2 design. But this kernel's DMA pipeline is ~5x under-subscribed
(compute-bound), so stashing bf16 residuals in the forward and READING them
in the backward converts serial MXU/VPU recompute into overlapped DMA:

  stash per element (224px, N=198, D=192):
    qkv   bf16 [N, 3D]   post-bias, exactly the fwd's bf16 matmul operands
    e3    bf16 [N, 3N]   unnormalized softmax numerators (the bf16 cast the
                         fwd already makes for the e@v matmul)
    rs3   fp32 [N, 3]    reciprocal row sums, one lane per head
    merged bf16 [N, D]   attention output (pre-proj)
    h     bf16 [N, 4D]   GELU output (the fwd's bf16 fc2 operand)
    hgrad bf16 [N, 4D]   GELU derivative (fwd computes it for ~2 extra ops
                         via the shared-exp trick)
  ~1.18 MB/elem -> the backward keeps only: LN1 fwd (for y), proj matmul +
  LN2 fwd (for x2/z), then the unchanged reverse sweep.

This file measures (a) stash-fwd vs production fwd time, (b) stash-bwd vs
production bwd time, (c) grad parity between the two backward formulations.
Findings feed ops/fused_block.py; not part of the package.

Usage: python benchmarks/scratch_stash.py [B] [rounds]
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

from deltakd_tpu.ops.fused_block import (_W_NAMES, _attention_bwd_one,
                                         _fused_block_bwd_call,
                                         _fused_block_fwd_call,
                                         _gelu_and_grad, _ln_bwd, _ln_fwd,
                                         _row_spec, _scale_spec, _w_specs,
                                         _weight_arrays)
from benchmarks.bench_block import block_params, timeit

N, D, H = 198, 192, 3
EPS = 1e-6


# -----------------------------------------------------------------------------
# Stash forward
# -----------------------------------------------------------------------------

def _stash_fwd_kernel(x_ref, s_attn_ref, s_mlp_ref, *rest, eps, H, need_feat):
    w_refs = rest[:len(_W_NAMES)]
    out_refs = rest[len(_W_NAMES):]
    w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
    dtype = x_ref.dtype
    b = pl.program_id(0)
    s_attn = s_attn_ref[b, 0]
    s_mlp = s_mlp_ref[b, 0]
    x32 = x_ref[0].astype(jnp.float32)
    Dv = x32.shape[-1]
    hd = Dv // H
    scale = hd ** -0.5

    y, _, _ = _ln_fwd(x32, w["g1"], w["b1"], eps)
    qkv = jax.lax.dot_general(y.astype(dtype), w["wqkv"], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + w["bqkv"]
    outs = []
    if need_feat:
        (out_ref, feat_ref, qkv_ref, e_ref, rs_ref, mg_ref, h_ref,
         hg_ref) = out_refs
    else:
        (out_ref, qkv_ref, e_ref, rs_ref, mg_ref, h_ref, hg_ref) = out_refs
        feat_ref = None
    qkv_ref[0] = qkv.astype(dtype)
    for hh in range(H):
        q = qkv[:, hh * hd:(hh + 1) * hd]
        k = qkv[:, Dv + hh * hd:Dv + (hh + 1) * hd]
        v = qkv[:, 2 * Dv + hh * hd:2 * Dv + (hh + 1) * hd]
        s = jax.lax.dot_general((q * scale).astype(dtype), k.astype(dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        e_lp = e.astype(dtype)
        e_ref[0, :, hh * N:(hh + 1) * N] = e_lp
        rs = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        rs_ref[0, :, hh:hh + 1] = rs
        o = jax.lax.dot_general(e_lp, v.astype(dtype), (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o * rs)
    merged = jnp.concatenate(outs, axis=-1)
    merged_lp = merged.astype(dtype)
    mg_ref[0] = merged_lp
    attn = jax.lax.dot_general(merged_lp, w["wproj"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + s_attn * attn
    z, _, _ = _ln_fwd(x2, w["g2"], w["b2"], eps)
    hpre = jax.lax.dot_general(z.astype(dtype), w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    h, hgrad = _gelu_and_grad(hpre)
    h_lp = h.astype(dtype)
    h_ref[0] = h_lp
    hg_ref[0] = hgrad.astype(dtype)
    feat = jax.lax.dot_general(h_lp, w["w2"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf2"]
    out_ref[0] = (x2 + s_mlp * feat).astype(out_ref.dtype)
    if need_feat:
        feat_ref[0] = feat.astype(feat_ref.dtype)


def stash_fwd_call(x, s_attn, s_mlp, ws, *, eps=EPS, H=H, need_feat=True):
    B, Nv, Dv = x.shape
    dt = x.dtype
    stash_shapes = [
        jax.ShapeDtypeStruct((B, Nv, 3 * Dv), dt),        # qkv
        jax.ShapeDtypeStruct((B, Nv, H * Nv), dt),        # e3
        jax.ShapeDtypeStruct((B, Nv, H), jnp.float32),    # rs3
        jax.ShapeDtypeStruct((B, Nv, Dv), dt),            # merged
        jax.ShapeDtypeStruct((B, Nv, 4 * Dv), dt),        # h
        jax.ShapeDtypeStruct((B, Nv, 4 * Dv), dt),        # hgrad
    ]
    stash_specs = [_row_spec(Nv, 3 * Dv), _row_spec(Nv, H * Nv),
                   _row_spec(Nv, H), _row_spec(Nv, Dv),
                   _row_spec(Nv, 4 * Dv), _row_spec(Nv, 4 * Dv)]
    out_shape = [jax.ShapeDtypeStruct((B, Nv, Dv), dt)]
    out_specs = [_row_spec(Nv, Dv)]
    if need_feat:
        out_shape.append(jax.ShapeDtypeStruct((B, Nv, Dv), dt))
        out_specs.append(_row_spec(Nv, Dv))
    out_shape += stash_shapes
    out_specs += stash_specs
    return pl.pallas_call(
        functools.partial(_stash_fwd_kernel, eps=eps, H=H, need_feat=need_feat),
        grid=(B,),
        in_specs=[_row_spec(Nv, Dv), _scale_spec(B), _scale_spec(B)]
        + _w_specs(ws),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, s_attn, s_mlp, *ws)


# -----------------------------------------------------------------------------
# Stash backward
# -----------------------------------------------------------------------------

def _stash_bwd_kernel(x_ref, s_attn_ref, s_mlp_ref, *rest, eps, H, need_feat):
    n_w = len(_W_NAMES)
    w_refs = rest[:n_w]
    rest = rest[n_w:]
    qkv_ref, e_ref, rs_ref, mg_ref, h_ref, hg_ref = rest[:6]
    rest = rest[6:]
    if need_feat:
        g_out_ref, g_feat_ref = rest[0], rest[1]
        dx_ref = rest[2]
        dw_refs = rest[3:]
    else:
        g_out_ref = rest[0]
        g_feat_ref = None
        dx_ref = rest[1]
        dw_refs = rest[2:]

    w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
    dtype = x_ref.dtype
    _, Nv, Dv = x_ref.shape
    hd = Dv // H
    scale = hd ** -0.5
    b = pl.program_id(0)
    s_attn = s_attn_ref[b, 0]
    s_mlp = s_mlp_ref[b, 0]

    # ---- cheap re-derivations from stash (no qkv/fc1/score matmuls, no
    # transcendentals): LN1 for (y, xhat1, rstd1); proj+LN2 for (x2, z)
    x32 = x_ref[0].astype(jnp.float32)
    y, xhat1, rstd1 = _ln_fwd(x32, w["g1"], w["b1"], eps)
    y_lp = y.astype(dtype)
    qkv_lp = qkv_ref[0]                      # bf16 [N, 3D]
    merged_lp = mg_ref[0]                    # bf16 [N, D]
    attn = jax.lax.dot_general(merged_lp, w["wproj"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + s_attn * attn
    z, xhat2, rstd2 = _ln_fwd(x2, w["g2"], w["b2"], eps)
    z_lp = z.astype(dtype)
    h_lp = h_ref[0]                          # bf16 [N, 4D]
    hgrad = hg_ref[0].astype(jnp.float32)    # bf16 -> fp32 [N, 4D]

    # ---- backward (identical structure to the production kernel)
    g_out = g_out_ref[0].astype(jnp.float32)
    g_feat = g_out * s_mlp
    if need_feat:
        g_feat = g_feat + g_feat_ref[0].astype(jnp.float32)
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

    dattn = dx2 * s_attn
    dattn_lp = dattn.astype(dtype)
    dwproj = jax.lax.dot_general(merged_lp, dattn_lp, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dbproj = jnp.sum(dattn, axis=0, keepdims=True)
    dmerged = jax.lax.dot_general(dattn_lp, w["wproj"], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    # attention backward from the stashed (e_bf16, rs) per head
    qkv32 = qkv_lp.astype(jnp.float32)
    es = [e_ref[0, :, i * Nv:(i + 1) * Nv].astype(jnp.float32)
          for i in range(H)]
    rss = [rs_ref[0, :, i:i + 1] for i in range(H)]
    dqkv = _attention_bwd_one(qkv32, dmerged, es, rss, Dv, H, hd, scale,
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

    dx_ref[0] = (dx2 + dx_ln).astype(dx_ref.dtype)

    tiles = (dg1, db1, dwqkv, dbqkv, dwproj, dbproj, dg2, db2,
             dw1, dbf1, dw2, dbf2)

    @pl.when(b == 0)
    def _():
        for r, t in zip(dw_refs, tiles):
            r[...] = t

    @pl.when(b > 0)
    def _():
        for r, t in zip(dw_refs, tiles):
            r[...] += t


def stash_bwd_call(x, s_attn, s_mlp, ws, stash, g_out, g_feat, *, eps=EPS,
                   H=H):
    B, Nv, Dv = x.shape
    need_feat = g_feat is not None
    g_in = [g_out] + ([g_feat] if need_feat else [])
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    stash_specs = [_row_spec(Nv, 3 * Dv), _row_spec(Nv, H * Nv),
                   _row_spec(Nv, H), _row_spec(Nv, Dv),
                   _row_spec(Nv, 4 * Dv), _row_spec(Nv, 4 * Dv)]
    return pl.pallas_call(
        functools.partial(_stash_bwd_kernel, eps=eps, H=H,
                          need_feat=need_feat),
        grid=(B,),
        in_specs=([_row_spec(Nv, Dv), _scale_spec(B), _scale_spec(B)]
                  + _w_specs(ws) + stash_specs + [_row_spec(Nv, Dv)] * len(g_in)),
        out_specs=tuple([_row_spec(Nv, Dv)] + _w_specs(ws)),
        out_shape=tuple([jax.ShapeDtypeStruct((B, Nv, Dv), x.dtype)]
                        + dw_shapes),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, s_attn, s_mlp, *ws, *stash, *g_in)


# -----------------------------------------------------------------------------

def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws = _weight_arrays(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    ones = jnp.ones((B, 1), jnp.float32)
    g_out = jax.random.normal(jax.random.PRNGKey(2), (B, N, D), jnp.bfloat16)
    g_feat = jax.random.normal(jax.random.PRNGKey(3), (B, N, D), jnp.bfloat16)

    prod_fwd = jax.jit(lambda x: _fused_block_fwd_call(
        x, ones, ones, ws, eps=EPS, H=H, need_feat=True))
    prod_bwd = jax.jit(lambda x, go, gf: _fused_block_bwd_call(
        x, ones, ones, ws, go, gf, eps=EPS, H=H))
    st_fwd = jax.jit(lambda x: stash_fwd_call(x, ones, ones, ws))
    def _st_bwd(x, go, gf):
        outs = stash_fwd_call(x, ones, ones, ws)
        stash = outs[2:]
        return stash_bwd_call(x, ones, ones, ws, stash, go, gf)
    # time the bwd alone by pre-materializing the stash (passed as args —
    # closing over it would bake 3.5 GB of constants into the program)
    stash_pre = jax.jit(lambda x: stash_fwd_call(x, ones, ones, ws))(x)[2:]
    _bwd_jit = jax.jit(lambda x, stash, go, gf: stash_bwd_call(
        x, ones, ones, ws, stash, go, gf))
    st_bwd_only = lambda x, go, gf: _bwd_jit(x, stash_pre, go, gf)

    # ---- numerics: stash bwd vs production bwd
    ref = prod_bwd(x, g_out, g_feat)
    got = st_bwd_only(x, g_out, g_feat)
    names = ["dx"] + list(_W_NAMES)
    print("grad parity (stash vs production recompute):")
    for nm, a, b in zip(names, ref, got):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        denom = np.abs(a32).max() + 1e-30
        print(f"  {nm:6s} max|diff| {np.abs(a32-b32).max():.3e} "
              f"(rel {np.abs(a32-b32).max()/denom:.3e})")

    # ---- timing, interleaved
    tf_p, tf_s, tb_p, tb_s = [], [], [], []
    for r in range(rounds):
        tf_p.append(timeit(prod_fwd, x, steps=30))
        tf_s.append(timeit(st_fwd, x, steps=30))
        tb_p.append(timeit(prod_bwd, x, g_out, g_feat, steps=30))
        tb_s.append(timeit(st_bwd_only, x, g_out, g_feat, steps=30))
        print(f"r{r}: fwd prod {tf_p[-1]*1e3:6.3f} stash {tf_s[-1]*1e3:6.3f} | "
              f"bwd prod {tb_p[-1]*1e3:6.3f} stash {tb_s[-1]*1e3:6.3f}")
    med = lambda v: sorted(v)[len(v) // 2]
    print(f"\nmedians (B={B}):")
    print(f"  fwd: prod {med(tf_p)*1e3:.3f} ms -> stash {med(tf_s)*1e3:.3f} ms")
    print(f"  bwd: prod {med(tb_p)*1e3:.3f} ms -> stash {med(tb_s)*1e3:.3f} ms")
    tot_p = med(tf_p) + med(tb_p)
    tot_s = med(tf_s) + med(tb_s)
    print(f"  fwd+bwd: {tot_p*1e3:.3f} -> {tot_s*1e3:.3f} ms "
          f"({100*(1-tot_s/tot_p):+.1f}%)")


if __name__ == "__main__":
    main()
