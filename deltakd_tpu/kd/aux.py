"""Auxiliary distillation heads as an explicit parameter collection.

The reference grafts ``nn.Module`` attributes onto the timm student object
after construction (``student_model.align = ...`` etc.,
reference model/models.py:76-176) and lets losses reach into the model at loss
time. Here the aux heads are a plain parameter pytree created per
distillation type, optimized jointly with the student and threaded through the
loss functions explicitly — no mutation, checkpoint-friendly, and trivially
shardable.

Initialization mirrors torch defaults so training dynamics match:
``nn.Linear``/``nn.Conv2d`` draw weights and biases from
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); ``mask_token`` starts at zero
(reference model/models.py:84).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def _torch_linear_init(key: jax.Array, in_dim: int, out_dim: int) -> Dict[str, jax.Array]:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def _torch_conv3x3_init(key: jax.Array, chans: int) -> Dict[str, jax.Array]:
    kw, kb = jax.random.split(key)
    fan_in = chans * 9
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(kw, (3, 3, chans, chans), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (chans,), jnp.float32, -bound, bound),
    }


def dense(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def conv3x3(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    """3x3 same-padding conv on NHWC (the reference permutes to NCHW for torch;
    NHWC is TPU-native and numerically identical)."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype)


def generation_apply(gen: Dict[str, Any], x: jax.Array) -> jax.Array:
    """conv3x3 → ReLU → conv3x3 'generation' head (reference model/models.py:85-88)."""
    x = conv3x3(gen["conv1"], x)
    x = jax.nn.relu(x)
    return conv3x3(gen["conv2"], x)


def _generation_init(key: jax.Array, dim: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"conv1": _torch_conv3x3_init(k1, dim), "conv2": _torch_conv3x3_init(k2, dim)}


def denoise_apply(p: Dict[str, Any], x: jax.Array, t: jax.Array,
                  rng: Optional[jax.Array], train: bool) -> jax.Array:
    """DiffKD denoising network (reference model/models.py:103-121):
    x + time_embed(t) broadcast over tokens, then Linear→GELU→Linear→Dropout(0.1)."""
    t_emb = t.astype(x.dtype).reshape(-1, 1)
    t_emb = dense(p["time2"], jax.nn.gelu(dense(p["time1"], t_emb), approximate=False))
    h = x + t_emb[:, None, :]
    h = dense(p["net2"], jax.nn.gelu(dense(p["net1"], h), approximate=False))
    if train and rng is not None:
        keep = jax.random.bernoulli(rng, 0.9, h.shape)
        h = jnp.where(keep, h / 0.9, 0.0).astype(h.dtype)
    return h


def simple_attention_scores(p: Dict[str, Any], x: jax.Array, num_heads: int = 8,
                            diagonal: bool = True) -> jax.Array:
    """SimpleAttention (reference model/models.py:38-56): fused-QK self-attention;
    returns the head-mean attention diagonal [B, N] (or the full map if not)."""
    B, N, C = x.shape
    hd = C // num_heads
    qk = dense(p["qk"], x).reshape(B, N, 2, num_heads, hd)
    q = qk[:, :, 0].transpose(0, 2, 1, 3)
    k = qk[:, :, 1].transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn * (hd ** -0.5), axis=-1)
    attn = attn.mean(axis=1)  # [B, N, N]
    if diagonal:
        return jnp.diagonal(attn, axis1=-2, axis2=-1)  # [B, N]
    return attn


def simple_attention_cls_row(p: Dict[str, Any], x: jax.Array, num_heads: int = 8) -> jax.Array:
    """Saliency method 2 (reference model/misc.py:94-116): CLS-query attention
    row over all tokens from the SimpleAttention qk projection; returns [B, N]."""
    B, N, C = x.shape
    hd = C // num_heads
    qk = dense(p["qk"], x)
    q, k = jnp.split(qk, 2, axis=-1)
    q = q.reshape(B, N, num_heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, num_heads, hd).transpose(0, 2, 1, 3)
    q_cls = q[:, :, 0:1]
    attn = jnp.einsum("bhqd,bhkd->bhqk", q_cls, k,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    return attn.mean(axis=1)[:, 0]  # [B, N]


def cross_attention_scores(p: Dict[str, Any], x_query: jax.Array, x_key: jax.Array,
                           num_heads: int = 8) -> jax.Array:
    """SimpleCrossAttention (reference model/models.py:14-35): separate q/k
    projections, head-mean attention of query rows over keys: [B, Nq, Nk]."""
    B, Nq, C = x_query.shape
    Nk = x_key.shape[1]
    hd = C // num_heads
    q = dense(p["q"], x_query).reshape(B, Nq, num_heads, hd).transpose(0, 2, 1, 3)
    k = dense(p["k"], x_key).reshape(B, Nk, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    return attn.mean(axis=1)  # [B, Nq, Nk]


def init_aux_params(key: jax.Array, distillation_type: str, student_dim: int,
                    teacher_dim: int, *, lrkd_rank: int = 32,
                    saliency_method: int = 1) -> Dict[str, Any]:
    """Create the aux-head parameter tree for one distillation type
    (the functional equivalent of reference model/models.py:74-176)."""
    t = distillation_type.lower()
    keys = iter(jax.random.split(key, 16))
    aux: Dict[str, Any] = {}
    if t == "vitkd":
        aux["align2"] = [_torch_linear_init(next(keys), student_dim, teacher_dim)
                         for _ in range(2)]
        aux["align"] = _torch_linear_init(next(keys), student_dim, teacher_dim)
        aux["mask_token"] = jnp.zeros((1, 1, teacher_dim), jnp.float32)
        aux["generation"] = _generation_init(next(keys), teacher_dim)
    elif t == "lrkd":
        aux["align"] = [_torch_linear_init(next(keys), student_dim, lrkd_rank)
                        for _ in range(3)]
    elif t == "diffkd":
        aux["denoise"] = {
            "net1": _torch_linear_init(next(keys), teacher_dim, teacher_dim * 2),
            "net2": _torch_linear_init(next(keys), teacher_dim * 2, teacher_dim),
            "time1": _torch_linear_init(next(keys), 1, teacher_dim),
            "time2": _torch_linear_init(next(keys), teacher_dim, teacher_dim),
        }
        aux["align"] = [_torch_linear_init(next(keys), student_dim, teacher_dim)
                        for _ in range(3)]
    elif t == "saliency_mgd":
        aux["align"] = _torch_linear_init(next(keys), student_dim, teacher_dim)
        aux["mask_token"] = jnp.zeros((1, 1, teacher_dim), jnp.float32)
        aux["generation"] = _generation_init(next(keys), teacher_dim)
        if saliency_method in (1, 2):
            aux["saliency_attn"] = {"qk": _torch_linear_init(next(keys), teacher_dim,
                                                             teacher_dim * 2)}
        elif saliency_method == 3:
            aux["saliency_attn"] = {
                "q": _torch_linear_init(next(keys), teacher_dim, teacher_dim),
                "k": _torch_linear_init(next(keys), teacher_dim, teacher_dim),
            }
    elif t == "mgd":
        aux["align"] = _torch_linear_init(next(keys), student_dim, teacher_dim)
        aux["mask_token"] = jnp.zeros((1, 1, teacher_dim), jnp.float32)
        aux["generation"] = _generation_init(next(keys), teacher_dim)
    elif t == "curkd":
        aux["curkd_align_early"] = [_torch_linear_init(next(keys), student_dim, teacher_dim)
                                    for _ in range(3)]
        aux["curkd_align_mid"] = [_torch_linear_init(next(keys), student_dim, teacher_dim)
                                  for _ in range(4)]
        aux["curkd_align_last"] = _torch_linear_init(next(keys), student_dim, teacher_dim)
        aux["mask_token"] = jnp.zeros((1, 1, teacher_dim), jnp.float32)
        aux["generation"] = _generation_init(next(keys), teacher_dim)
    elif t == "wasskd":
        aux["align_wasskd"] = [_torch_linear_init(next(keys), student_dim, teacher_dim)
                               for _ in range(3)]
    # none / soft / hard need no aux heads (soft/hard use the model's dist head).
    return aux
