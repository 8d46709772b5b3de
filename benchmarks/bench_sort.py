"""Microbenchmark for the WassKD-l1 sort paths (one chip).

    python benchmarks/bench_sort.py [--batch 128] [--n 196] [--d 384]

Compares, at the production shape ([B, 196, 384] bf16, sort along tokens):
  - XLA bitonic value network forward (what sorted_l1 lowers to today)
  - Pallas in-VMEM value sort forward
  - value+grad of the production sorted_l1 (XLA autodiff through the net)
  - value+grad of the fused Pallas sorted_l1 (custom VJP), when available
Same scalar-fetch methodology as bench_block.py (see CLAUDE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)) if leaf.ndim else leaf)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=196)
    ap.add_argument("--d", type=int, default=384)
    args = ap.parse_args()

    from deltakd_tpu.ops import sort as sort_mod

    key = jax.random.PRNGKey(0)
    ks, kt = jax.random.split(key)
    s = jax.random.normal(ks, (args.batch, args.n, args.d), jnp.bfloat16)
    t = jax.random.normal(kt, (args.batch, args.n, args.d), jnp.bfloat16)
    shape = f"[{args.batch},{args.n},{args.d}]"

    xla_sort = jax.jit(lambda x: sort_mod.bitonic_sort(x, axis=1))
    ms = timeit(xla_sort, s) * 1e3
    print(f"XLA value network fwd        {shape}: {ms:7.2f} ms")

    if jax.default_backend() == "tpu":
        pl_sort = jax.jit(lambda x: sort_mod.bitonic_sort_pallas(x, axis=1))
        ms = timeit(pl_sort, s) * 1e3
        print(f"Pallas in-VMEM value fwd     {shape}: {ms:7.2f} ms")

    grad_fn = jax.jit(jax.value_and_grad(
        lambda x: sort_mod._sorted_l1_network(x, t, axis=1)
        if hasattr(sort_mod, "_sorted_l1_network")
        else sort_mod.sorted_l1(x, t, axis=1)))
    ms = timeit(grad_fn, s) * 1e3
    print(f"sorted_l1 XLA value+grad     {shape}: {ms:7.2f} ms")

    if hasattr(sort_mod, "sorted_l1_pallas") and jax.default_backend() == "tpu":
        gp = jax.jit(jax.value_and_grad(
            lambda x: sort_mod.sorted_l1_pallas(x, t, axis=1)))
        ms = timeit(gp, s) * 1e3
        print(f"sorted_l1 Pallas value+grad  {shape}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
