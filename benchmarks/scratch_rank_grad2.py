"""Variants of the rank-counting sorted_l1 backward, timed on TPU.

g = [r < u_lt] + [r < u_le] - 1  with  r = strict+stable rank of s_i in s,
u_lt/u_le = strict/weak rank of s_i in t. All are O(N^2) comparison-count
reductions; the art is getting XLA to fuse them into one pass at the VPU
roofline (~2-4 ms at [128,196,384]).
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def v0_separate(s, t):
    """Baseline from scratch_rank_grad.py (einsum tie term)."""
    sf = s.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    s_j = sf[:, None, :, :]
    s_i = sf[:, :, None, :]
    lt = (s_j < s_i).astype(jnp.float32)
    eq = (s_j == s_i).astype(jnp.float32)
    n = s.shape[1]
    tri = (np.arange(n)[None, :] < np.arange(n)[:, None]).astype(np.float32)
    r = jnp.sum(lt, axis=2) + jnp.einsum("bijd,ij->bid", eq, jnp.asarray(tri))
    t_j = tf[:, None, :, :]
    u_lt = jnp.sum((t_j < s_i).astype(jnp.float32), axis=2)
    u_le = jnp.sum((t_j <= s_i).astype(jnp.float32), axis=2)
    return jnp.where(r < u_lt, 1.0, jnp.where(r >= u_le, -1.0, 0.0))


def v1_fused(s, t):
    """One broadcast expression per reduction, no einsum; fp32 compares."""
    sf = s.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    n = s.shape[1]
    s_j = sf[:, None, :, :]
    s_i = sf[:, :, None, :]
    t_j = tf[:, None, :, :]
    tri = jnp.asarray(
        (np.arange(n)[None, :] < np.arange(n)[:, None])[None, :, :, None])
    # m1 = u_lt - r ; eqT = # t == s_i
    m1 = jnp.sum((t_j < s_i).astype(jnp.float32)
                 - (s_j < s_i).astype(jnp.float32)
                 - ((s_j == s_i) & tri).astype(jnp.float32), axis=2)
    eqT = jnp.sum((t_j == s_i).astype(jnp.float32), axis=2)
    return ((m1 > 0).astype(jnp.float32)
            + (m1 + eqT > 0).astype(jnp.float32) - 1.0)


def v2_bf16cmp(s, t):
    """Compare in native bf16 (no upcast before the compare)."""
    n = s.shape[1]
    s_j = s[:, None, :, :]
    s_i = s[:, :, None, :]
    t_j = t[:, None, :, :]
    tri = jnp.asarray(
        (np.arange(n)[None, :] < np.arange(n)[:, None])[None, :, :, None])
    m1 = jnp.sum((t_j < s_i).astype(jnp.float32)
                 - (s_j < s_i).astype(jnp.float32)
                 - ((s_j == s_i) & tri).astype(jnp.float32), axis=2)
    eqT = jnp.sum((t_j == s_i).astype(jnp.float32), axis=2)
    return ((m1 > 0).astype(jnp.float32)
            + (m1 + eqT > 0).astype(jnp.float32) - 1.0)


def v3_chunked(s, t, ci=32):
    """v2 with the i axis processed in chunks (bounded working set)."""
    n = s.shape[1]
    outs = []
    tri_full = np.arange(n)[None, :] < np.arange(n)[:, None]
    t_j = t[:, None, :, :]
    s_j = s[:, None, :, :]
    for c0 in range(0, n, ci):
        c1 = min(c0 + ci, n)
        s_i = s[:, c0:c1, None, :]
        tri = jnp.asarray(tri_full[None, c0:c1, :, None])
        m1 = jnp.sum((t_j < s_i).astype(jnp.float32)
                     - (s_j < s_i).astype(jnp.float32)
                     - ((s_j == s_i) & tri).astype(jnp.float32), axis=2)
        eqT = jnp.sum((t_j == s_i).astype(jnp.float32), axis=2)
        outs.append((m1 > 0).astype(jnp.float32)
                    + (m1 + eqT > 0).astype(jnp.float32) - 1.0)
    return jnp.concatenate(outs, axis=1)


def v4_noties_t(s, t):
    """Drop the t-tie zero band (sign(0) := -1 — still a valid |.|
    subgradient); keeps s-tie stable ranking. 1 fewer compare per lane."""
    n = s.shape[1]
    s_j = s[:, None, :, :]
    s_i = s[:, :, None, :]
    t_j = t[:, None, :, :]
    tri = jnp.asarray(
        (np.arange(n)[None, :] < np.arange(n)[:, None])[None, :, :, None])
    m1 = jnp.sum((t_j < s_i).astype(jnp.float32)
                 - (s_j < s_i).astype(jnp.float32)
                 - ((s_j == s_i) & tri).astype(jnp.float32), axis=2)
    return 2.0 * (m1 > 0).astype(jnp.float32) - 1.0


def v5_int8(s, t):
    """Accumulate counts in int8-ish: compare -> int32 reduce."""
    n = s.shape[1]
    s_j = s[:, None, :, :]
    s_i = s[:, :, None, :]
    t_j = t[:, None, :, :]
    tri = jnp.asarray(
        (np.arange(n)[None, :] < np.arange(n)[:, None])[None, :, :, None])
    m1 = jnp.sum((t_j < s_i).astype(jnp.int32)
                 - (s_j < s_i).astype(jnp.int32)
                 - ((s_j == s_i) & tri).astype(jnp.int32), axis=2)
    eqT = jnp.sum((t_j == s_i).astype(jnp.int32), axis=2)
    return ((m1 > 0).astype(jnp.float32)
            + (m1 + eqT > 0).astype(jnp.float32) - 1.0)


def main():
    rng = np.random.RandomState(0)
    B, N, D = 128, 196, 384
    s = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    t = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)

    fns = [("v0_separate", v0_separate), ("v1_fused", v1_fused),
           ("v2_bf16cmp", v2_bf16cmp),
           ("v3_chunk32", functools.partial(v3_chunked, ci=32)),
           ("v3_chunk64", functools.partial(v3_chunked, ci=64)),
           ("v4_noties_t", v4_noties_t), ("v5_int8", v5_int8)]
    ref = None
    for name, f in fns:
        jf = jax.jit(f)
        out = jf(s, t)
        got = np.asarray(jax.device_get(out))
        if ref is None:
            ref = got
        tag = "" if np.array_equal(got, ref) else \
            f"  (DIFFERS from v0 at {np.mean(got != ref):.4f} of elems)"
        _ = float(out.astype(jnp.float32).sum())
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = jf(s, t)
        _ = float(out.astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:.2f} ms{tag}", flush=True)


if __name__ == "__main__":
    main()
