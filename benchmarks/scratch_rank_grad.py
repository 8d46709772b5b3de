"""Prototype: rank-counting backward for sorted_l1 (wasskd-l1).

d/ds_i mean|sort(s) - sort(t)| = sign(s_i - t_sorted[r(i)]) / numel with
r(i) the stable rank of s_i in s. With u<(i) = #{j: t_j < s_i} and
u<=(i) = #{j: t_j <= s_i}:

    sign = +1 if r < u<     (t at my rank is strictly below me)
           -1 if r >= u<=   (t at my rank is strictly above me)
            0 otherwise     (t at my rank equals me)

This needs NO sort / gather / select-replay in the backward — just three
O(N^2) comparison-count reductions, and it reproduces torch.sort's
index-scatter gradient exactly (stable ranks), including bf16 ties.

Timing target: beat the 3x ~7.5 ms autodiff backward sorts at
[128, 196, 384] (ops/sort.py negative-results table).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ON_TPU = os.environ.get("SCRATCH_TPU") == "1"
if not ON_TPU:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax
import jax.numpy as jnp


def rank_grad(s, t):
    """sign(s_i - t_sorted[stable_rank_s(i)]) per element, fp32.

    s, t: [B, N, D]; ranks along axis 1 independently per (b, d).
    """
    sf = s.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    # stable rank of s_i within s: strict-less count + equal-with-lower-index
    s_j = sf[:, None, :, :]   # [B, 1, N, D] — j axis
    s_i = sf[:, :, None, :]   # [B, N, 1, D] — i axis
    lt = (s_j < s_i).astype(jnp.float32)
    eq = (s_j == s_i).astype(jnp.float32)
    n = s.shape[1]
    tri = (np.arange(n)[None, :] < np.arange(n)[:, None]).astype(np.float32)
    r = jnp.sum(lt, axis=2) + jnp.einsum(
        "bijd,ij->bid", eq, jnp.asarray(tri))
    t_j = tf[:, None, :, :]
    u_lt = jnp.sum((t_j < s_i).astype(jnp.float32), axis=2)
    u_le = jnp.sum((t_j <= s_i).astype(jnp.float32), axis=2)
    return jnp.where(r < u_lt, 1.0, jnp.where(r >= u_le, -1.0, 0.0))


def torch_ref_grad(s_np, t_np):
    import torch

    s = torch.tensor(s_np, dtype=torch.float32, requires_grad=True)
    t = torch.tensor(t_np, dtype=torch.float32)
    loss = (s.sort(dim=1).values - t.sort(dim=1).values).abs().mean()
    loss.backward()
    return s.grad.numpy() * s_np.size


def stable_ref_grad(s_np, t_np):
    """Stable-sort index-scatter gradient (the semantics rank_grad targets).

    torch.sort(stable=False) may permute ties differently — any tie
    permutation is an equally valid subgradient scatter; per-tie-group sums
    must agree.
    """
    idx = np.argsort(s_np, axis=1, kind="stable")
    s_sorted = np.take_along_axis(s_np, idx, axis=1)
    t_sorted = np.sort(t_np, axis=1)
    sgn = np.sign(s_sorted - t_sorted)
    g = np.zeros_like(s_np)
    np.put_along_axis(g, idx, sgn, axis=1)
    return g


def main():
    rng = np.random.RandomState(0)
    B, N, D = (128, 196, 384) if ON_TPU else (4, 17, 6)

    if not ON_TPU:
        # correctness vs torch index-scatter semantics, incl. ties
        for trial in range(3):
            s_np = rng.randn(B, N, D).astype(np.float32)
            t_np = rng.randn(B, N, D).astype(np.float32)
            if trial > 0:  # force ties
                s_np = np.round(s_np * 4) / 4
                t_np = np.round(t_np * 4) / 4
            if trial == 2:  # s-vs-t exact ties
                t_np[:, ::3] = s_np[:, ::3]
            g = np.asarray(rank_grad(jnp.asarray(s_np), jnp.asarray(t_np)))
            ref = stable_ref_grad(s_np, t_np)
            ok = np.array_equal(g, ref)
            # vs torch (unstable ties): per-(b,d) column sums must agree
            tg = torch_ref_grad(s_np, t_np)
            sums_ok = np.allclose(g.sum(axis=1), tg.sum(axis=1), atol=1e-5)
            print(f"trial {trial}: stable-scatter match = {ok} "
                  f"(maxdiff {np.abs(g - ref).max()}), "
                  f"torch column-sum match = {sums_ok}")
            assert ok and sums_ok
        print("CPU correctness PASS")
        return

    # TPU timing: rank_grad vs autodiff backward through the sort network
    from deltakd_tpu.ops.sort import sorted_l1

    s = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    t = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)

    f_rank = jax.jit(rank_grad)
    f_auto = jax.jit(jax.grad(lambda a, b: sorted_l1(a, b, axis=1)))

    for name, f in (("rank_grad", f_rank), ("autodiff_sorted_l1", f_auto)):
        out = f(s, t)
        _ = float(out.astype(jnp.float32).sum())  # warm + sync
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = f(s, t)
        _ = float(out.astype(jnp.float32).sum())
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:.2f} ms  [{B},{N},{D}]")


if __name__ == "__main__":
    main()
