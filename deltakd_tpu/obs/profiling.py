"""Startup profiling probes: FLOPs/params/throughput banner.

Equivalent of the reference's thop.profile + ``measure_throughput``
(reference tools/train.py:230-241, tools/utils.py:162-180): parameter count
from the pytree, analytic FLOPs from XLA's compiled cost analysis, and a
timed steady-state inference throughput probe.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> float:
    """Parameters in millions."""
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) / 1e6


def model_gflops(module, params, input_size: int) -> Optional[float]:
    """Forward-pass GFLOPs from XLA cost analysis (per image)."""
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    try:
        lowered = jax.jit(
            lambda p, x: module.apply({"params": p}, x, train=False).logits
        ).lower(params, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) / 1e9
    except Exception:
        return None


def measure_throughput(module, params, *, batch_size: int = 64,
                       input_size: int = 224, num_batches: int = 10) -> float:
    """images/sec of compiled inference (reference utils.py:162-180 analog,
    minus its CPU-roundtrip fragility — SURVEY.md bug B5)."""
    # sync by fetching a scalar: block_until_ready is unreliable on tunneled
    # TPU backends (see CLAUDE.md timing notes)
    fwd = jax.jit(lambda p, x: module.apply({"params": p}, x,
                                            train=False).logits.sum())
    x = jnp.zeros((batch_size, input_size, input_size, 3), module.dtype)
    float(fwd(params, x))  # compile outside the timer
    start = time.perf_counter()
    for _ in range(num_batches):
        out = fwd(params, x)
    float(out)  # device execution is in-order: last result syncs them all
    elapsed = time.perf_counter() - start
    return batch_size * num_batches / elapsed
