"""Microbenchmark of the fused ViT block kernel (real TPU).

Times the fused Pallas block forward and forward+backward at the student
(DeiT-Tiny D=192 H=3) and teacher (DeiT-Small D=384 H=6) shapes, printing
ms and achieved matmul TF/s so kernel changes can be evaluated in isolation
from the full train step. Timing per CLAUDE.md: chain compiled iterations on
device, sync via a scalar fetch, subtract the measured fetch cost.

Usage: python benchmarks/bench_block.py [B ...]   (default 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    _fetch(out)
    fetch_cost = time.perf_counter() - t0
    results = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        _fetch(out)
        results.append((time.perf_counter() - t0 - fetch_cost) / steps)
    return sorted(results)[1]


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)


def block_params(key, D, mlp_ratio=4):
    ks = jax.random.split(key, 8)
    init = jax.nn.initializers.lecun_normal()
    return {
        "norm1": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "attn": {
            "qkv": {"kernel": init(ks[0], (D, 3 * D)),
                    "bias": jnp.zeros((3 * D,))},
            "proj": {"kernel": init(ks[1], (D, D)), "bias": jnp.zeros((D,))},
        },
        "norm2": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "mlp": {
            "fc1": {"kernel": init(ks[2], (D, mlp_ratio * D)),
                    "bias": jnp.zeros((mlp_ratio * D,))},
            "fc2": {"kernel": init(ks[3], (mlp_ratio * D, D)),
                    "bias": jnp.zeros((D,))},
        },
    }


def main(batches):
    from deltakd_tpu.ops.fused_block import fused_vit_block

    N = 198
    for B in batches:
        for name, D, H in (("student D=192", 192, 3), ("teacher D=384", 384, 6)):
            params = jax.tree.map(lambda a: a.astype(jnp.float32),
                                  block_params(jax.random.PRNGKey(0), D))
            x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D),
                                  jnp.bfloat16)

            # matmul FLOPs (2*MACs): qkv 6NDD*2? -> counted as 2*(3ND^2+N^2D/2...)
            fwd_flops = B * (2 * (3 * N * D * D + N * D * D + 8 * N * D * D)
                             + 4 * N * N * D)
            bwd_flops = fwd_flops * 2  # grads
            rec_flops = B * (2 * (3 * N * D * D + N * D * D + 4 * N * D * D)
                             + 6 * N * N * D)  # recompute w/o fc2 + score rebuild

            @jax.jit
            def fwd(x, params=params):
                o, f = fused_vit_block(x, params, num_heads=H)
                return o

            def _consume(l, g):
                # sum every grad leaf so XLA cannot DCE the backward
                return l + sum(jnp.sum(a.astype(jnp.float32))
                               for a in jax.tree.leaves(g))

            @jax.jit
            def fwdbwd(x, params=params):
                def loss(p, x):
                    o, f = fused_vit_block(x, p, num_heads=H)
                    return (jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
                            + jnp.sum(f.astype(jnp.float32)) * 1e-6)
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
                return _consume(l, g)

            @jax.jit
            def fwdbwd_nofeat(x, params=params):
                def loss(p, x):
                    o, f = fused_vit_block(x, p, num_heads=H,
                                           need_features=False)
                    return jnp.sum(o.astype(jnp.float32) ** 2) * 1e-6
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
                return _consume(l, g)

            t_f = timeit(fwd, x)
            t_fb = timeit(fwdbwd, x)
            t_fb_nf = timeit(fwdbwd_nofeat, x)
            t_b = t_fb - t_f
            print(f"B={B} {name}: fwd {t_f*1e3:7.3f} ms "
                  f"({fwd_flops/t_f/1e12:6.1f} TF/s) | "
                  f"fwd+bwd {t_fb*1e3:7.3f} ms "
                  f"({(2*fwd_flops+bwd_flops+rec_flops)/t_fb/1e12:6.1f} TF/s eff) | "
                  f"bwd-only {t_b*1e3:7.3f} ms "
                  f"({(fwd_flops+bwd_flops+rec_flops)/max(t_b,1e-9)/1e12:6.1f} TF/s) | "
                  f"nofeat fwd+bwd {t_fb_nf*1e3:7.3f} ms")


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [256])
