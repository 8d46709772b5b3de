"""Multi-host runtime initialization.

The reference initializes NCCL process groups from torchrun env vars with a
barrier and 1800s timeout (reference tools/utils.py:23-65). The JAX analog is
``jax.distributed.initialize()``: on TPU pods it auto-discovers the
coordinator from the environment; on single-host runs it must NOT be called.
No explicit barrier is needed — XLA collectives synchronize, and orbax uses
the coordination service for multi-host checkpoints.
"""

from __future__ import annotations

import os

_INITIALIZED = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when the environment indicates a multi-host
    run; safe no-op otherwise. Returns True if initialization happened."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    multi_host_markers = (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    )
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi = any(os.environ.get(k) for k in multi_host_markers)
    multi = multi or (hosts and len(hosts.split(",")) > 1)
    if not multi:
        return False
    import jax

    jax.distributed.initialize()
    _INITIALIZED = True
    return True
