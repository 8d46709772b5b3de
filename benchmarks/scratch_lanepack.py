"""Lane-packing micro-experiment (round-4 verdict idea 3b).

Hypothesis under test: VPU elementwise stages on student-shaped [N=198,
D=192] tiles waste lanes (192 = 128 + 64 -> the second lane tile is half
masked), and re-laying the same elements onto full 128-lane tiles
([297, 128]; 198*192 == 297*128) would cut the padded-tile work.

Three Pallas kernels run an identical P-pass transcendental VPU chain
(mul/add/tanh — GELU-grade) per grid element, interleaved round-robin
(chip throttling drift, see ops/fused_block.py timing note):

  ragged   [198, 192] blocks — the student layout as-is
  packed   [297, 128] blocks — same element count, full lane tiles
  repack   [198, 192] blocks, reshaped to [297, 128] and back around the
           chain each pass — measures the Mosaic relayout cost that any
           integration into the fused block kernel would pay (matmuls
           need [N, D], so packed VPU stages sit between relayouts)

Integration math: the fused student kernel's elementwise stages can only
use a packed layout between matmuls, so the win must survive 2 relayouts
per stage. LN lane-reductions over D=192 cannot pack at all (a 192-wide
row spans 1.5 packed rows).

Usage: python benchmarks/scratch_lanepack.py [B] [passes] [rounds]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D = 198, 192
NP_, DP = 297, 128  # 198*192 == 297*128 == 38016


def _chain(x, passes):
    for _ in range(passes):
        x = jnp.tanh(x * 1.0001 + 0.0625)
    return x


def _kernel_plain(x_ref, o_ref, *, passes):
    o_ref[...] = _chain(x_ref[...], passes)


def _kernel_repack(x_ref, o_ref, *, passes):
    x = x_ref[...]
    for _ in range(passes):
        p = x.reshape(1, NP_, DP)
        p = jnp.tanh(p * 1.0001 + 0.0625)
        x = p.reshape(1, N, D)
    o_ref[...] = x


def build(name, B, passes):
    if name == "ragged":
        shp, kern = (N, D), functools.partial(_kernel_plain, passes=passes)
    elif name == "packed":
        shp, kern = (NP_, DP), functools.partial(_kernel_plain, passes=passes)
    else:
        shp, kern = (N, D), functools.partial(_kernel_repack, passes=passes)
    spec = pl.BlockSpec((1, *shp), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern, grid=(B,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, *shp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))
    x = jnp.asarray(np.random.RandomState(0).randn(B, *shp), jnp.float32)
    f = jax.jit(lambda a: call(a))
    f(x)  # compile
    return f, x


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    names = []
    fns = {}
    for n in ("ragged", "packed", "repack"):
        try:
            fns[n] = build(n, B, passes)
            names.append(n)
        except Exception as e:  # noqa: BLE001 — record Mosaic rejections
            print(f"[{n}] FAILED TO COMPILE: {str(e).splitlines()[0][:120]}",
                  flush=True)
    print("compiled", flush=True)

    # scalar-fetch cost (CLAUDE.md: time by fetching a scalar over the tunnel)
    f, x = fns["ragged"]
    t0 = time.perf_counter()
    float(f(x)[0, 0, 0])
    fetch = time.perf_counter() - t0 - 0.0  # includes one step; subtracted below

    reps = 30
    times = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            f, x = fns[n]
            y = f(x)
            float(y[0, 0, 0])  # sync before timing
            t0 = time.perf_counter()
            for _ in range(reps):
                y = f(y) if y.shape == x.shape else f(x)
            float(y[0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            times[n].append(dt)
            print(f"  round {r} {n:<7} {dt * 1e6:8.1f} us", flush=True)

    base = float(np.median(times["ragged"]))
    print(f"B={B} passes={passes} (medians, per pallas_call):")
    for n in names:
        t = float(np.median(times[n]))
        print(f"  {n:<7} {t * 1e6:8.1f} us  ({(t / base - 1) * 100:+.1f}% vs ragged)")


if __name__ == "__main__":
    main()
