"""timm/DeiT checkpoint importer: torch state_dict → Flax param tree.

The reference gets its pretrained teacher by calling
``timm.create_model(name, pretrained=True, num_classes=...)``
(reference model/models.py:60-63), which downloads a torch state_dict and
reinitializes the classifier head when ``num_classes`` differs from the
pretrained head. On an air-gapped TPU host we instead import a locally stored
state_dict (``.pth``/``.npz``/``.npy`` pickle of name → array).

Semantics match timm's loading:
  * linear weights are transposed ([out,in] → [in,out]);
  * the patch-embed conv kernel goes OIHW → HWIO;
  * the fused QKV keeps timm's (3, heads, head_dim) output-dim packing, which
    is exactly how our ``Attention`` unpacks it;
  * a classifier head whose shape mismatches the target stays at the target's
    (fresh) initialization — the reference behaves the same way via timm;
  * position embeddings are bicubically interpolated onto the target grid when
    resolutions differ (reference tools/utils.py:146-158).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from deltakd_tpu.models.pos_embed import interpolate_pos_embed


def _to_numpy(v: Any) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v
    # torch tensor without importing torch at module scope
    if hasattr(v, "detach"):
        return v.detach().cpu().numpy()
    return np.asarray(v)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch/numpy checkpoint file into a flat name → ndarray dict."""
    if path.endswith((".npz", ".npy")):
        data = np.load(path, allow_pickle=True)
        if isinstance(data, np.lib.npyio.NpzFile):
            return {k: data[k] for k in data.files}
        return dict(data.item())
    import torch  # torch-cpu is only needed for .pth checkpoints

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict", "model_ema"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {strip_module_prefix(k): _to_numpy(v) for k, v in ckpt.items()}


def strip_module_prefix(key: str) -> str:
    # DDP checkpoints prefix every key with "module." (reference tools/utils.py:11-16)
    return key[7:] if key.startswith("module.") else key


def timm_to_flax(state: Mapping[str, Any], target_params: Dict[str, Any],
                 ) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Fill ``target_params`` (our initialized tree) from a timm state_dict.

    Returns (new_params, report) where report lists loaded / skipped /
    missing keys for logging.
    """
    import copy

    state = {strip_module_prefix(k): _to_numpy(v) for k, v in state.items()}
    params = copy.deepcopy(dict(target_params))
    loaded, skipped = [], []

    def put(tree_path, value, expect_shape=None):
        node = params
        *parents, leaf = tree_path
        for p in parents:
            node = node[p]
        tgt = np.asarray(node[leaf])
        value = np.asarray(value)
        if expect_shape is not None and tuple(value.shape) != tuple(expect_shape):
            raise ValueError(f"{tree_path}: shape {value.shape} != {expect_shape}")
        if tgt.shape != value.shape:
            skipped.append("/".join(tree_path))
            return
        # jnp.array (not asarray): on CPU asarray can zero-copy the buffer of
        # a live torch tensor (state_dict().numpy() views), silently aliasing
        # "frozen" params to tensors a torch optimizer later mutates in place.
        node[leaf] = jnp.array(value, dtype=jnp.asarray(tgt).dtype)
        loaded.append("/".join(tree_path))

    # tokens & position embedding
    if "cls_token" in state:
        put(("cls_token",), state["cls_token"])
    if "dist_token" in state and "dist_token" in params:
        put(("dist_token",), state["dist_token"])
    if "pos_embed" in state:
        src = jnp.asarray(state["pos_embed"], dtype=jnp.float32)
        tgt = np.asarray(params["pos_embed"])
        src_prefix = 2 if "dist_token" in state else 1
        tgt_prefix = 2 if "dist_token" in params else 1
        if src_prefix != tgt_prefix:
            # Align prefix token count: keep CLS slot, duplicate it for a new
            # DIST slot or drop the DIST slot (rare; mirrors the reference's
            # lenient token-count handling at tools/utils.py:139-144).
            patch = src[:, src_prefix:]
            cls = src[:, :1]
            prefix = jnp.concatenate([cls] * tgt_prefix, axis=1)
            src = jnp.concatenate([prefix, patch], axis=1)
        src = interpolate_pos_embed(src, tgt_prefix, tgt.shape[1] - tgt_prefix)
        put(("pos_embed",), src)

    # patch embed: OIHW → HWIO
    if "patch_embed.proj.weight" in state:
        w = state["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
        put(("patch_embed", "kernel"), w)
        put(("patch_embed", "bias"), state["patch_embed.proj.bias"])

    def linear(src_prefix, tree_path):
        w = state.get(src_prefix + ".weight")
        if w is None:
            return
        put(tuple(tree_path) + ("kernel",), w.T)
        b = state.get(src_prefix + ".bias")
        if b is not None:
            put(tuple(tree_path) + ("bias",), b)

    def layernorm(src_prefix, tree_path):
        if src_prefix + ".weight" in state:
            put(tuple(tree_path) + ("scale",), state[src_prefix + ".weight"])
            put(tuple(tree_path) + ("bias",), state[src_prefix + ".bias"])

    depth = len([k for k in params if k.startswith("blocks_")])
    for i in range(depth):
        t = f"blocks.{i}"
        f = f"blocks_{i}"
        layernorm(f"{t}.norm1", (f, "norm1"))
        linear(f"{t}.attn.qkv", (f, "attn", "qkv"))
        linear(f"{t}.attn.proj", (f, "attn", "proj"))
        layernorm(f"{t}.norm2", (f, "norm2"))
        linear(f"{t}.mlp.fc1", (f, "mlp", "fc1"))
        linear(f"{t}.mlp.fc2", (f, "mlp", "fc2"))

    layernorm("norm", ("norm",))
    linear("head", ("head",))
    if "head_dist" in params:
        linear("head_dist", ("head_dist",))

    missing = sorted(set(state) - {  # informational only
        k for k in state if any(k.startswith(p) for p in (
            "cls_token", "dist_token", "pos_embed", "patch_embed", "blocks.",
            "norm.", "head", "pre_logits"))})
    return params, {"loaded": loaded, "skipped": skipped, "unconsumed": missing}
