"""Flax DeiT / ViT with explicit per-block MLP intermediates.

The reference captures per-block FFN outputs by registering PyTorch forward
hooks on every ``block.mlp`` (reference model/models.py:181-199) — the hidden
state *post-MLP, pre-residual-add*. Hooks don't exist in a functional world
and break under DDP in the reference anyway (SURVEY.md bug B6); here the model
simply returns those intermediates as part of its output, which is both
correct under any parallelism and free under XLA (dead outputs are eliminated
when unused).

Architecture parity targets timm's ``VisionTransformer`` /
``deit_*_(distilled_)patch16_224`` (what ``timm.create_model`` builds at
reference model/models.py:60-68): conv patch embed, CLS (+DIST) tokens,
learned position embeddings over all tokens, pre-norm blocks with fused-QKV
attention and GELU MLP (ratio 4), LayerNorm eps 1e-6, stochastic depth with a
linear ramp across blocks, and the DeiT distilled head behavior — a
``(cls_logits, dist_logits)`` tuple in distilled-training mode, the average of
the two heads otherwise (consumed by the soft/hard KD path at reference
model/loss.py:31-33).

TPU notes: compute runs in a configurable ``dtype`` (bf16 by default) with
fp32 parameters; all shapes are static; attention is a plain einsum softmax
that XLA fuses and tiles onto the MXU (a Pallas fused-attention kernel can be
swapped in via ``attention_fn`` for large configurations).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

Dtype = Any

trunc_init = nn.initializers.truncated_normal(stddev=0.02)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Static architecture description (one per model-zoo name)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = False
    drop_path_rate: float = 0.0
    drop_rate: float = 0.0
    ln_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def num_prefix_tokens(self) -> int:
        return 2 if self.distilled else 1


class ViTOutput(struct.PyTreeNode):
    """Everything a KD objective may need from one forward pass.

    ``features`` holds the post-MLP pre-residual hidden state of every block,
    each of shape [B, N, D] — exactly what the reference's hooks collect
    (reference model/models.py:188-193).
    """

    logits: jax.Array                     # [B, C] (cls head, or head average for distilled eval)
    logits_dist: Optional[jax.Array]      # [B, C] dist head (distilled models only)
    features: Tuple[jax.Array, ...]       # depth × [B, N, D]

    @property
    def train_tuple(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        return self.logits, self.logits_dist


def drop_path(x: jax.Array, rate: float, rng: jax.Array, deterministic: bool) -> jax.Array:
    """Per-sample stochastic depth on a residual branch (timm DropPath)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class _DenseParams(nn.Module):
    """Declares Dense-shaped params without computing, so a fused kernel can
    consume them while the param tree stays identical to nn.Dense."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", trunc_init, (self.in_dim, self.out_dim),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,),
                          jnp.float32)
        return kernel, bias


class _LNParams(nn.Module):
    """Declares LayerNorm-shaped params (same names/inits as nn.LayerNorm)."""

    dim: int

    @nn.compact
    def __call__(self):
        return {"scale": self.param("scale", nn.initializers.ones,
                                    (self.dim,), jnp.float32),
                "bias": self.param("bias", nn.initializers.zeros,
                                   (self.dim,), jnp.float32)}


class _AttnParams(nn.Module):
    """Declares the attention param subtree (qkv + proj) without computing."""

    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, self.dim * 3, name="qkv")()
        wp, bp = _DenseParams(self.dim, self.dim, name="proj")()
        return {"qkv": {"kernel": wq, "bias": bq},
                "proj": {"kernel": wp, "bias": bp}}


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return {"fc1": {"kernel": w1, "bias": b1},
                "fc2": {"kernel": w2, "bias": b2}}


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    mlp_fn: Optional[Callable] = None  # fused (x, w1, b1, w2, b2) -> out

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dim = x.shape[-1]
        w1, b1 = _DenseParams(in_dim, self.hidden_dim, name="fc1")()
        w2, b2 = _DenseParams(self.hidden_dim, self.out_dim, name="fc2")()
        if self.mlp_fn is not None:
            return self.mlp_fn(x, w1, b1, w2, b2)
        h = x @ w1.astype(self.dtype) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=False)
        return h @ w2.astype(self.dtype) + b2.astype(self.dtype)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None  # (q, k, v) -> out, all [B, H, N, hd]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, D = x.shape
        head_dim = D // self.num_heads
        qkv = nn.Dense(D * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v)
        else:
            scale = head_dim ** -0.5
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, kernel_init=trunc_init, name="proj")(out)
        return out


class Block(nn.Module):
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path_rate: float
    ln_eps: float
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    mlp_fn: Optional[Callable] = None
    block_fn: Optional[Callable] = None    # fully-fused block kernel
    collect_features: bool = True          # False skips the feature write in block_fn
    declare_only: bool = False             # declare params + draw droppath
    # scales, return (params, s_attn, s_mlp) without computing — the caller
    # runs a multi-block fused kernel over several blocks' params (the param
    # tree and RNG draw order stay identical to the compute path)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> Tuple[jax.Array, jax.Array]:
        D = x.shape[-1]
        if (self.block_fn is not None or self.declare_only) and self.qkv_bias:
            # Fully-fused path: declare the identical param tree, draw the
            # droppath branch scales (timm: two independent per-sample masks,
            # one per residual branch), and run the whole block in one kernel.
            params = {
                "norm1": _LNParams(D, name="norm1")(),
                "attn": _AttnParams(D, name="attn")(),
                "norm2": _LNParams(D, name="norm2")(),
                "mlp": _MlpParams(D, int(D * self.mlp_ratio), name="mlp")(),
            }
            s_attn = s_mlp = None
            if (not deterministic and self.drop_path_rate > 0.0
                    and self.has_rng("droppath")):
                keep = 1.0 - self.drop_path_rate
                B = x.shape[0]
                k1 = self.make_rng("droppath")
                k2 = self.make_rng("droppath")
                s_attn = jax.random.bernoulli(k1, keep, (B,)).astype(jnp.float32) / keep
                s_mlp = jax.random.bernoulli(k2, keep, (B,)).astype(jnp.float32) / keep
            if self.declare_only:
                return params, s_attn, s_mlp
            return self.block_fn(x, params, num_heads=self.num_heads,
                                 ln_eps=self.ln_eps, scale_attn=s_attn,
                                 scale_mlp=s_mlp,
                                 need_features=self.collect_features)
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.qkv_bias, self.dtype,
                      self.attention_fn, name="attn")(y)
        use_droppath = (not deterministic and self.drop_path_rate > 0.0
                        and self.has_rng("droppath"))
        if use_droppath:
            y = drop_path(y, self.drop_path_rate, self.make_rng("droppath"), deterministic)
        x = x + y

        z = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        mlp_out = Mlp(int(D * self.mlp_ratio), D, self.dtype,
                      self.mlp_fn, name="mlp")(z)
        z = mlp_out
        if use_droppath:
            z = drop_path(z, self.drop_path_rate, self.make_rng("droppath"), deterministic)
        x = x + z
        # mlp_out is the hook-equivalent intermediate: post-MLP, pre-droppath,
        # pre-residual (reference model/models.py:188-193 hooks block.mlp).
        return x, mlp_out


class VisionTransformer(nn.Module):
    """DeiT/ViT backbone with dual-head distilled variant."""

    cfg: ViTConfig
    dtype: Dtype = jnp.float32
    attention_fn: Optional[Callable] = None
    mlp_fn: Optional[Callable] = None
    block_fn: Optional[Callable] = None    # fully-fused block kernel (TPU)
    block_pair_fn: Optional[Callable] = None  # two-blocks-per-kernel variant
    # — measured SLOWER than single blocks at full-model level (+2.2%,
    # negative result in ops/fused_block.py pair section); kept for A/B
    # runs (DELTAKD_PAIR=1), no default path wires it.
    collect_features: Any = True           # True/False or frozenset of block
    # indices whose features the KD objective reads (kd.losses.feature_indices)

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 distilled_training: bool = False) -> ViTOutput:
        cfg = self.cfg
        B = x.shape[0]
        x = x.astype(self.dtype)

        # Patch embedding: 16x16 stride-16 conv == per-patch linear, MXU-friendly.
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=self.dtype, kernel_init=trunc_init, name="patch_embed")(x)
        x = x.reshape(B, -1, cfg.embed_dim)  # [B, num_patches, D]

        cls_token = self.param("cls_token", trunc_init, (1, 1, cfg.embed_dim), jnp.float32)
        prefix = [jnp.tile(cls_token.astype(self.dtype), (B, 1, 1))]
        if cfg.distilled:
            dist_token = self.param("dist_token", trunc_init, (1, 1, cfg.embed_dim), jnp.float32)
            prefix.append(jnp.tile(dist_token.astype(self.dtype), (B, 1, 1)))
        x = jnp.concatenate(prefix + [x], axis=1)

        pos_embed = self.param(
            "pos_embed", trunc_init,
            (1, cfg.num_prefix_tokens + cfg.num_patches, cfg.embed_dim), jnp.float32)
        x = x + pos_embed.astype(self.dtype)
        if cfg.drop_rate > 0.0:
            x = nn.Dropout(cfg.drop_rate)(x, deterministic=not train)

        # Stochastic-depth linear ramp across blocks (timm: linspace(0, rate, depth)).
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1) for i in range(cfg.depth)]
        feats = []

        def _collect(i):
            # collect_features: True/False, or a collection of block indices
            # (kd.losses.feature_indices) — the fused kernel then skips the
            # feature write for blocks no KD objective reads
            cf = self.collect_features
            return bool(cf) if isinstance(cf, bool) else i in cf

        pair_on = self.block_pair_fn is not None and cfg.qkv_bias
        i = 0
        while i < cfg.depth:
            if pair_on and i + 1 < cfg.depth:
                # Two consecutive blocks in ONE kernel. Each Block module
                # still declares its own params (identical tree + droppath
                # RNG draws), so checkpoints are pairing-agnostic.
                p1, sa1, sm1 = Block(
                    cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, dpr[i],
                    cfg.ln_eps, self.dtype, declare_only=True,
                    name=f"blocks_{i}")(x, deterministic=not train)
                p2, sa2, sm2 = Block(
                    cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, dpr[i + 1],
                    cfg.ln_eps, self.dtype, declare_only=True,
                    name=f"blocks_{i + 1}")(x, deterministic=not train)
                x, f1, f2 = self.block_pair_fn(
                    x, p1, p2, num_heads=cfg.num_heads, ln_eps=cfg.ln_eps,
                    scale_attn1=sa1, scale_mlp1=sm1,
                    scale_attn2=sa2, scale_mlp2=sm2,
                    need_features1=_collect(i), need_features2=_collect(i + 1))
                feats.extend([f1, f2])
                i += 2
                continue
            x, mlp_out = Block(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                               dpr[i], cfg.ln_eps, self.dtype, self.attention_fn,
                               self.mlp_fn, self.block_fn, _collect(i),
                               name=f"blocks_{i}")(x, deterministic=not train)
            feats.append(mlp_out)
            i += 1

        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype, name="norm")(x)

        head = nn.Dense(cfg.num_classes, dtype=self.dtype,
                        kernel_init=trunc_init, name="head")
        logits_cls = head(x[:, 0]).astype(jnp.float32)
        if cfg.distilled:
            head_dist = nn.Dense(cfg.num_classes, dtype=self.dtype,
                                 kernel_init=trunc_init, name="head_dist")
            logits_dist = head_dist(x[:, 1]).astype(jnp.float32)
            if train:
                # timm's distilled DeiT returns (cls, dist) whenever training
                # — the base criterion and train accuracy always consume the
                # cls head alone (reference loss.py:31-41), for feature-KD
                # objectives too, not just soft/hard. The head average is an
                # eval-only behavior.
                return ViTOutput(logits_cls, logits_dist, tuple(feats))
            return ViTOutput((logits_cls + logits_dist) / 2.0, logits_dist, tuple(feats))
        return ViTOutput(logits_cls, None, tuple(feats))
