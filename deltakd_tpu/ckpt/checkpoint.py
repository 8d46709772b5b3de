"""Checkpoint / resume / finetune.

Reference semantics reproduced (reference tools/utils.py:90-160,
tools/train.py:270-286, 349-357): a full training checkpoint holds
{epoch, params(+aux), optimizer, EMA} and is rewritten every epoch with a
``.best`` copy on a new best validation accuracy; ``--resume`` restores
everything, ``--finetune`` loads backbone weights only — dropping
shape-mismatched classifier heads and bicubically interpolating the patch
position embeddings onto the new grid.

Storage is orbax (async-capable, sharded-array aware) with a JSON sidecar for
scalars. Finetune sources can be either our own orbax checkpoints or raw
timm/torch state_dicts (via the importer), so reference-world checkpoints
migrate directly.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import orbax.checkpoint as ocp

from deltakd_tpu.models.pos_embed import interpolate_pos_embed

_STATE_DIR = "state"
_BEST_SUFFIX = ".best"
_META = "meta.json"


_CKPTR: Optional[ocp.StandardCheckpointer] = None


def _ckptr() -> ocp.StandardCheckpointer:
    # one long-lived checkpointer so async saves can span epoch boundaries
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save has committed (call before
    process exit / preemption shutdown)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(save_dir: str, state, *, epoch: int, best_acc: float,
                    is_best: bool, block: bool = True) -> None:
    """Write save_dir/state (+ meta.json); copy to save_dir.best on new best
    (reference utils.py:90-93).

    ``block=False`` returns as soon as orbax has snapshotted the arrays — the
    commit overlaps the next epoch's compute (orbax renames atomically on
    commit, and {epoch, best_acc} ride *inside* the checkpoint tree so a
    crash mid-save can never pair new metadata with old weights; meta.json is
    a human-readable convenience sidecar only). The caller must pass
    donation-safe arrays (host copies or fresh device copies) when deferring.
    """
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, _STATE_DIR)
    ckptr = _ckptr()
    ckptr.wait_until_finished()  # serialize with any previous async save
    # numpy (not jnp) scalars: host-local device arrays are not serializable
    # in multi-host saves; numpy is treated as replicated on every host
    tree = {"state": state,
            "meta": {"epoch": np.asarray(epoch, np.int32),
                     "best_acc": np.asarray(best_acc, np.float32)}}
    ckptr.save(path, tree, force=True)
    with open(os.path.join(save_dir, _META), "w") as f:
        json.dump({"epoch": epoch, "best_acc": float(best_acc)}, f)
    if is_best or block:
        ckptr.wait_until_finished()
    if is_best:
        best_dir = save_dir + _BEST_SUFFIX
        if os.path.isdir(best_dir):
            shutil.rmtree(best_dir)
        shutil.copytree(save_dir, best_dir)


def load_checkpoint(save_dir: str, target_state) -> Tuple[Any, int, float]:
    """Restore (state, next_epoch, best_acc) for --resume
    (reference train.py:274-280)."""
    save_dir = os.path.abspath(save_dir)
    path = os.path.join(save_dir, _STATE_DIR)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"Checkpoint not found: {path}")
    # Distinguish the wrapped {'state','meta'} layout from the legacy bare
    # state tree by the checkpoint's own structure metadata — a blanket
    # try/except around restore would mask genuine restore failures (shape
    # mismatches, corruption) behind a misleading legacy retry.
    wrapped = False
    try:
        md = _ckptr().metadata(path)
        tree = getattr(getattr(md, "item_metadata", md), "tree", md)
        wrapped = set(tree.keys()) == {"state", "meta"}
    except Exception:
        pass  # very old orbax dirs without readable metadata → legacy path
    if wrapped:
        tree = _ckptr().restore(
            path, {"state": target_state,
                   "meta": {"epoch": np.zeros((), np.int32),
                            "best_acc": np.zeros((), np.float32)}})
        return (tree["state"], int(tree["meta"]["epoch"]),
                float(tree["meta"]["best_acc"]))
    # legacy layout: bare state tree + meta.json sidecar
    state = _ckptr().restore(path, target_state)
    with open(os.path.join(save_dir, _META)) as f:
        meta = json.load(f)
    return state, int(meta["epoch"]), float(meta.get("best_acc", 0.0))


def _merge_for_finetune(source: Dict[str, Any], target: Dict[str, Any],
                        num_prefix_tokens: int, log=print) -> Dict[str, Any]:
    """Copy matching leaves; drop mismatched heads; interpolate pos_embed
    (reference tools/utils.py:112-160)."""
    import copy

    out = copy.deepcopy(target)

    def visit(src, dst, path=""):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                visit(v, dst[k], f"{path}{k}/")
            else:
                tgt_leaf = dst[k]
                if k == "pos_embed" or path + k == "pos_embed":
                    new_patches = tgt_leaf.shape[1] - num_prefix_tokens
                    v = interpolate_pos_embed(jnp.asarray(v), num_prefix_tokens,
                                              new_patches)
                if tuple(v.shape) != tuple(jnp.asarray(tgt_leaf).shape):
                    log(f"[finetune] dropping {path}{k}: "
                        f"{tuple(v.shape)} vs {tuple(tgt_leaf.shape)}")
                    continue
                dst[k] = jnp.asarray(v, jnp.asarray(tgt_leaf).dtype)

    visit(source, out)
    return out


def load_student_for_finetune(checkpoint: str, target_student_params,
                              *, num_prefix_tokens: int, log=print
                              ) -> Dict[str, Any]:
    """Load student backbone weights from either an orbax checkpoint dir
    (ours) or a torch/timm state_dict file (reference-world)."""
    if os.path.isdir(checkpoint):
        # our layout: <dir>/state holds a TrainState pytree; accept the dir,
        # its parent, or a bare params tree
        for candidate in (os.path.join(checkpoint, _STATE_DIR), checkpoint):
            if os.path.isdir(candidate) and os.listdir(candidate):
                try:
                    restored = _ckptr().restore(candidate)
                    break
                except Exception:
                    continue
        else:
            raise FileNotFoundError(f"No restorable checkpoint under {checkpoint}")
        params = restored
        # peel the wrapper layers: {"state": TrainState-like}["params"]["student"]
        for key in ("state", "params", "student"):
            if isinstance(params, dict) and key in params:
                params = params[key]
        if not isinstance(params, dict):
            raise ValueError(f"Unrecognized checkpoint structure in {checkpoint}")
        return _merge_for_finetune(params, target_student_params,
                                   num_prefix_tokens, log)
    # torch/timm state_dict file
    from deltakd_tpu.models.import_timm import load_state_dict, timm_to_flax

    state = load_state_dict(checkpoint)
    params, report = timm_to_flax(state, target_student_params)
    if report["skipped"]:
        log(f"[finetune] reinitialized (shape mismatch): {report['skipped']}")
    return params
