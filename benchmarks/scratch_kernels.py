"""Throwaway ablation variants of the fused block forward kernel.

Measures which per-element phases (GELU erf, softmax normalization, LN,
casts) actually bound the student-shape kernel, and whether interleaving two
independent elements per grid step lets Mosaic overlap VPU and MXU phases.
Not part of the package — findings feed ops/fused_block.py.

Usage: python benchmarks/scratch_kernels.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deltakd_tpu.ops.fused_block import (_W_NAMES, _attention_fwd_one, _erf,
                                         _gelu, _ln_fwd, _row_spec,
                                         _scale_spec, _w_specs,
                                         _weight_arrays)
from benchmarks.bench_block import block_params, timeit

N, D, H = 198, 192, 3
EPS = 1e-6


def _block_fwd_variant(x32, w, dtype, *, gelu_mode, softmax_mode):
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
        if softmax_mode == "full":
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(dtype), v.astype(dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        elif softmax_mode == "post_div":
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            o = jax.lax.dot_general(e.astype(dtype), v.astype(dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o = o / jnp.sum(e, axis=-1, keepdims=True)
        else:  # "none": no exp at all (NOT valid math; isolates softmax cost)
            o = jax.lax.dot_general(s.astype(dtype), v.astype(dtype),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        outs.append(o)
    merged = jnp.concatenate(outs, axis=-1)
    attn = jax.lax.dot_general(merged.astype(dtype), w["wproj"],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bproj"]
    x2 = x32 + attn
    z, _, _ = _ln_fwd(x2, w["g2"], w["b2"], EPS)
    hpre = jax.lax.dot_general(z.astype(dtype), w["w1"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf1"]
    if gelu_mode == "erf":
        h_ = _gelu(hpre)
    elif gelu_mode == "relu":
        h_ = jnp.maximum(hpre, 0.0)
    else:  # identity
        h_ = hpre
    feat = jax.lax.dot_general(h_.astype(dtype), w["w2"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32) + w["bf2"]
    return x2 + feat


def make_fwd(gelu_mode="erf", softmax_mode="full", tb=1):
    def kernel(x_ref, *rest):
        w_refs = rest[:len(_W_NAMES)]
        out_ref = rest[len(_W_NAMES)]
        w = {name: r[...] for name, r in zip(_W_NAMES, w_refs)}
        for i in range(tb):
            x32 = x_ref[i].astype(jnp.float32)
            out = _block_fwd_variant(x32, w, x_ref.dtype,
                                     gelu_mode=gelu_mode,
                                     softmax_mode=softmax_mode)
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
    B = 256
    params = jax.tree.map(lambda a: a.astype(jnp.float32),
                          block_params(jax.random.PRNGKey(0), D))
    ws = _weight_arrays(params, jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D), jnp.bfloat16)
    flops = B * (24 * N * D * D + 4 * N * N * D)

    variants = [
        ("baseline erf/full-softmax tb1", make_fwd("erf", "full", 1)),
        ("gelu=relu                 tb1", make_fwd("relu", "full", 1)),
        ("gelu=identity             tb1", make_fwd("none", "full", 1)),
        ("softmax=post_div          tb1", make_fwd("erf", "post_div", 1)),
        ("softmax=none (invalid)    tb1", make_fwd("erf", "none", 1)),
        ("stripped (no gelu/smax)   tb1", make_fwd("none", "none", 1)),
        ("baseline                  tb2", make_fwd("erf", "full", 2)),
        ("baseline                  tb4", make_fwd("erf", "full", 4)),
        ("stripped                  tb2", make_fwd("none", "none", 2)),
    ]
    for name, fn in variants:
        t = timeit(fn, x, ws)
        print(f"{name}: {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TF/s)")


if __name__ == "__main__":
    main()
