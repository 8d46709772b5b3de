"""Device mesh + sharding rules.

The reference's only parallelism is NCCL DDP over the student
(reference tools/utils.py:23-65, train.py:307-309). The TPU-native equivalent
is a ``jax.sharding.Mesh`` with a ``data`` axis: the batch is sharded across
it, parameters are replicated, and XLA inserts the gradient all-reduce over
ICI from the sharding annotations — no process groups, no barriers, no
buckets.

A second ``model`` axis is wired in from the start (SURVEY.md §2.2 build
note): when its size is > 1 the Megatron-style tensor-parallel rules below
shard attention QKV / MLP / head projections column- or row-wise so the same
train step scales past data parallelism without code changes. DeiT-Tiny never
needs it; the multi-chip dry-run exercises it.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    elif len(mesh_shape) == 1:
        mesh_shape = (mesh_shape[0], 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, ("data", "model"))


def is_main_process() -> bool:
    """rank-0 gating equivalent (reference train.py:221,230,243)."""
    return jax.process_index() == 0


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over the data axis (replicated over model)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -----------------------------------------------------------------------------
# Tensor-parallel parameter rules (model axis)
# -----------------------------------------------------------------------------

def _param_spec(path: Tuple[Any, ...], leaf) -> P:
    names = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 2:
        return P()
    # column-parallel: split the output features
    if ("qkv" in names or "fc1" in names) and "kernel" in names:
        return P(None, "model")
    # row-parallel: split the input features (XLA adds the psum)
    if ("fc2" in names or ("attn" in joined and "proj" in names)) and "kernel" in names:
        return P("model", None)
    return P()


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding tree: TP rules on the model axis, replication elsewhere.

    With mesh model=1 this degenerates to full replication (pure DP)."""
    if mesh.shape["model"] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params)


def state_shardings(mesh: Mesh, state) -> Any:
    """Shard every ndim≥2 leaf of the TrainState by the param rules (optimizer
    moments mirror their parameters); scalars replicate."""
    if mesh.shape["model"] == 1:
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), state)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), state)
