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
_FORMAT = "wrapped-v1"  # {'state','meta'} tree inside a numbered state dir
_PREV_SUFFIX = ".prev"  # same-epoch re-save parks the old committed dir here


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


def _committed_state_dirs(save_dir: str):
    """Committed state dirs under save_dir, oldest→newest: the numbered
    ``state-<epoch>`` layout, its ``.prev`` sibling (a same-epoch re-save
    parks the previous committed dir there so a crash mid-re-save still
    finds a complete checkpoint), plus the legacy bare ``state``. Orbax
    commits by atomic rename, so any dir matching these names (no tmp
    suffix) is a complete checkpoint. A ``.prev`` sorts just below its
    numbered sibling."""
    out = []
    if not os.path.isdir(save_dir):
        return out
    for name in os.listdir(save_dir):
        full = os.path.join(save_dir, name)
        if not os.path.isdir(full):
            continue
        prev = 1
        if name.endswith(_PREV_SUFFIX):
            name, prev = name[:-len(_PREV_SUFFIX)], 0
        if name == _STATE_DIR:
            out.append(((-1, prev), full))
        elif name.startswith(_STATE_DIR + "-"):
            tail = name[len(_STATE_DIR) + 1:]
            if tail.isdigit():
                out.append(((int(tail), prev), full))
    return [p for _, p in sorted(out)]


def save_checkpoint(save_dir: str, state, *, epoch: int, best_acc: float,
                    is_best: bool, block: bool = True) -> None:
    """Write save_dir/state-<epoch> (+ meta.json); copy to save_dir.best on a
    new best (reference utils.py:90-93).

    ``block=False`` returns as soon as orbax has snapshotted the arrays — the
    commit overlaps the next epoch's compute (orbax renames atomically on
    commit, and {epoch, best_acc} ride *inside* the checkpoint tree so a
    crash mid-save can never pair new metadata with old weights; meta.json is
    a human-readable convenience sidecar only). The caller must pass
    donation-safe arrays (host copies or fresh device copies) when deferring.

    Durability: each epoch saves to a FRESH ``state-<epoch>`` dir; older dirs
    are deleted only after the next save has *committed* (the
    wait_until_finished below serializes on the previous async save). A hard
    kill at any point therefore leaves at least one complete checkpoint on
    disk — the round-2 layout (``force=True`` into one reused dir) deleted
    the old checkpoint at save() time and had up to a whole epoch with
    nothing resumable.
    """
    save_dir = os.path.abspath(save_dir)
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{_STATE_DIR}-{epoch}")
    ckptr = _ckptr()
    ckptr.wait_until_finished()  # serialize with any previous async save
    if jax.process_index() == 0:
        # Drop superseded checkpoints but KEEP the newest committed one: it
        # stays on disk until the save started below has itself committed
        # (i.e. it is deleted at the start of the NEXT save), so a crash
        # during this save still finds a complete checkpoint.
        committed = _committed_state_dirs(save_dir)
        keep = committed[-1] if committed else None
        for old in committed:
            if old != keep and old != path:
                shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(path):
            # Same-epoch re-save (tests, restarts): ``path`` may be the ONLY
            # committed checkpoint, so never rmtree it before the replacement
            # commits — park it at ``.prev`` (atomic rename; recognized by
            # the scanner, deleted as superseded on the next save).
            prev = path + _PREV_SUFFIX
            if os.path.isdir(prev):
                shutil.rmtree(prev, ignore_errors=True)
            os.replace(path, prev)
    # numpy (not jnp) scalars: host-local device arrays are not serializable
    # in multi-host saves; numpy is treated as replicated on every host
    tree = {"state": state,
            "meta": {"epoch": np.asarray(epoch, np.int32),
                     "best_acc": np.asarray(best_acc, np.float32)}}
    ckptr.save(path, tree)
    if jax.process_index() == 0:
        # proc-0-only: N concurrent truncate-writes to the shared meta.json
        # could expose an empty/torn file to a crash-time reader
        with open(os.path.join(save_dir, _META), "w") as f:
            json.dump({"epoch": epoch, "best_acc": float(best_acc),
                       "format": _FORMAT, "state_dir": os.path.basename(path)}, f)
    if is_best or block:
        ckptr.wait_until_finished()
    if is_best and jax.process_index() == 0:
        best_dir = save_dir + _BEST_SUFFIX
        tmp = best_dir + ".tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        shutil.copytree(path, os.path.join(tmp, os.path.basename(path)))
        shutil.copy2(os.path.join(save_dir, _META), os.path.join(tmp, _META))
        if os.path.isdir(best_dir):
            shutil.rmtree(best_dir)
        os.replace(tmp, best_dir)


def _resolve_state_dir(save_dir: str) -> str:
    """Newest committed state dir under save_dir. Prefers the explicit
    ``state_dir`` pointer written to meta.json at save time (the format
    marker); falls back to scanning for ``state-<epoch>`` / legacy ``state``
    dirs, newest first."""
    try:
        with open(os.path.join(save_dir, _META)) as f:
            pointed = json.load(f).get("state_dir")
        if pointed:
            full = os.path.join(save_dir, pointed)
            if os.path.isdir(full):
                return full
    except (OSError, ValueError):
        pass
    committed = _committed_state_dirs(save_dir)
    if committed:
        return committed[-1]
    raise FileNotFoundError(
        f"Checkpoint not found: no state dir under {save_dir}")


def load_checkpoint(save_dir: str, target_state) -> Tuple[Any, int, float]:
    """Restore (state, next_epoch, best_acc) for --resume
    (reference train.py:274-280)."""
    save_dir = os.path.abspath(save_dir)
    path = _resolve_state_dir(save_dir)
    # Distinguish the wrapped {'state','meta'} layout from the legacy bare
    # state tree. Primary signal: the explicit format marker written to
    # meta.json at save time (immune to orbax metadata API drift). Fallback
    # for pre-marker checkpoints: probe the checkpoint's structure metadata.
    # A blanket try/except around restore would mask genuine restore failures
    # (shape mismatches, corruption) behind a misleading legacy retry.
    wrapped = False
    try:
        with open(os.path.join(save_dir, _META)) as f:
            wrapped = json.load(f).get("format") == _FORMAT
    except (OSError, ValueError):
        pass
    if not wrapped:
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
        # our layout: <dir>/state-<epoch> (or legacy <dir>/state) holds a
        # TrainState pytree; accept the dir, its parent, or a bare params tree
        candidates = []
        try:
            candidates.append(_resolve_state_dir(checkpoint))
        except FileNotFoundError:
            pass
        candidates.append(checkpoint)
        for candidate in candidates:
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
