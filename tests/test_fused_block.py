"""Fused transformer-block kernel vs the unfused module path.

The CPU test pins the pure-JAX reference implementation against the flax
Block module (same math, different composition); the TPU-gated tests pin the
Pallas kernel's forward and gradients against that reference and the whole
VisionTransformer against its unfused self. Tolerances are a few bf16 ulps
at the observed activation scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deltakd_tpu.models.vit import Block, ViTConfig, VisionTransformer
from deltakd_tpu.ops.fused_block import (_HAS_PLTPU, fused_vit_block,
                                         reference_vit_block)

tpu_only = pytest.mark.skipif(
    not (_HAS_PLTPU and jax.default_backend() == "tpu"),
    reason="Pallas TPU backend unavailable (CPU test run)")

D, H, N, B = 64, 2, 18, 4


def _block_and_params(dtype=jnp.float32, seed=0):
    blk = Block(num_heads=H, mlp_ratio=4.0, qkv_bias=True, drop_path_rate=0.0,
                ln_eps=1e-6, dtype=dtype)
    params = blk.init({"params": jax.random.PRNGKey(seed)},
                      jnp.zeros((1, N, D)), True)["params"]
    # shift LN params off their ones/zeros init so LN grads are non-trivial
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(
            jax.random.PRNGKey(p.size % 977), p.shape, jnp.float32).astype(p.dtype),
        params)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (B, N, D), dtype)
    return blk, params, x


def test_reference_block_matches_flax_module():
    blk, params, x = _block_and_params()
    out_m, feat_m = blk.apply({"params": params}, x, True)
    out_r, feat_r = reference_vit_block(x, params, num_heads=H)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_m),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feat_r), np.asarray(feat_m),
                               atol=1e-4, rtol=1e-4)


def test_reference_block_droppath_scales():
    _, params, x = _block_and_params()
    # scale 0 on both branches must be the identity
    zero = jnp.zeros((B,))
    out, _ = reference_vit_block(x, params, num_heads=H, scale_attn=zero,
                                 scale_mlp=zero)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@tpu_only
def test_fused_block_forward_matches_reference():
    _, params, x = _block_and_params(jnp.bfloat16)
    sa = jax.random.uniform(jax.random.PRNGKey(5), (B,)) + 0.5
    sm = jax.random.uniform(jax.random.PRNGKey(6), (B,)) + 0.5
    out_f, feat_f = jax.jit(lambda x: fused_vit_block(
        x, params, num_heads=H, scale_attn=sa, scale_mlp=sm))(x)
    out_r, feat_r = jax.jit(lambda x: reference_vit_block(
        x, params, num_heads=H, scale_attn=sa, scale_mlp=sm))(x)
    scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32)))) + 1e-6
    assert float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                 - out_r.astype(jnp.float32)))) < 0.02 * scale
    assert float(jnp.max(jnp.abs(feat_f.astype(jnp.float32)
                                 - feat_r.astype(jnp.float32)))) < 0.02 * scale


@tpu_only
def test_fused_block_gradients_match_reference():
    _, params, x = _block_and_params(jnp.bfloat16)

    def loss(fn):
        def f(p, x):
            o, feat = fn(x, p, num_heads=H)
            return (jnp.sum(o.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.sin(feat.astype(jnp.float32))))
        return f

    gf = jax.jit(jax.grad(loss(fused_vit_block), argnums=(0, 1)))(params, x)
    gr = jax.jit(jax.grad(loss(reference_vit_block), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        denom = float(jnp.max(jnp.abs(b32))) + 1e-6
        assert float(jnp.max(jnp.abs(a32 - b32))) < 2e-2 * denom


@tpu_only
def test_model_with_fused_blocks_matches_unfused():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=D, depth=3,
                    num_heads=H, num_classes=10, distilled=True)
    unfused = VisionTransformer(cfg, dtype=jnp.bfloat16)
    fused = VisionTransformer(cfg, dtype=jnp.bfloat16, block_fn=fused_vit_block)
    params = unfused.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    # identical param trees: the fused path declares the same names/shapes
    p2 = fused.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 32, 32, 3)))["params"]
    assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, p2)

    x = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 32, 3), jnp.float32)
    o_u = unfused.apply({"params": params}, x, train=False)
    o_f = fused.apply({"params": params}, x, train=False)
    scale = float(jnp.max(jnp.abs(o_u.logits))) + 1e-6
    assert float(jnp.max(jnp.abs(o_f.logits - o_u.logits))) < 0.02 * scale
    for fu, fr in zip(o_f.features, o_u.features):
        s = float(jnp.max(jnp.abs(fr.astype(jnp.float32)))) + 1e-6
        assert float(jnp.max(jnp.abs(fu.astype(jnp.float32)
                                     - fr.astype(jnp.float32)))) < 0.02 * s


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-device virtual CPU mesh "
                           "(real-TPU runs see a single chip)")
class TestMultiDeviceFusedKernel:
    """The fused kernel's custom_partitioning rule on the virtual 8-device
    CPU mesh, executed via Pallas interpret mode. This is the one code path
    that produces the production headline — it must survive the reference's
    own deployment shape (multi-GPU DDP ≙ a multi-chip data axis,
    reference tools/train.py:307-309) with both the forward outputs and the
    psum'd backward weight grads exactly matching the unpartitioned math."""

    @pytest.fixture(autouse=True)
    def _interpret(self):
        from deltakd_tpu.ops import fused_block
        fused_block.set_interpret(True)
        yield
        fused_block.set_interpret(False)

    def _mesh(self, shape):
        from jax.sharding import Mesh
        devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
        return Mesh(devs, ("data", "model"))

    @pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
    def test_forward_and_grads_match_reference_on_mesh(self, mesh_shape):
        from jax.sharding import NamedSharding, PartitionSpec as P

        _, params, x = _block_and_params()
        B = x.shape[0] * 4  # 16 rows: divisible by every data-axis size here
        x = jax.random.normal(jax.random.PRNGKey(9), (B, N, D), jnp.float32)
        sa = jax.random.uniform(jax.random.PRNGKey(5), (B,)) + 0.5
        sm = jax.random.uniform(jax.random.PRNGKey(6), (B,)) + 0.5
        mesh = self._mesh(mesh_shape)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
        ps = jax.device_put(params, NamedSharding(mesh, P()))

        def loss(fn):
            def f(p, x):
                o, feat = fn(x, p, num_heads=H, scale_attn=sa, scale_mlp=sm)
                return (jnp.sum(o.astype(jnp.float32) ** 2)
                        + jnp.sum(jnp.sin(feat.astype(jnp.float32))))
            return f

        fused_val, fused_grads = jax.jit(
            jax.value_and_grad(loss(fused_vit_block), argnums=(0, 1)))(ps, xs)
        ref_val, ref_grads = jax.jit(
            jax.value_and_grad(loss(reference_vit_block), argnums=(0, 1)))(
                params, x)

        assert np.isfinite(float(fused_val))
        np.testing.assert_allclose(float(fused_val), float(ref_val),
                                   rtol=2e-5)
        flat_f = jax.tree.leaves(fused_grads)
        flat_r = jax.tree.leaves(ref_grads)
        for a, b in zip(flat_f, flat_r):
            a32 = np.asarray(a, np.float32)
            b32 = np.asarray(b, np.float32)
            denom = np.max(np.abs(b32)) + 1e-6
            np.testing.assert_allclose(a32, b32, atol=1e-4 * denom)

    def test_forward_output_stays_batch_sharded(self):
        """The partitioning rule must not replicate the batch: the fused
        output's sharding keeps the data axis (no all-gather inserted)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        _, params, _ = _block_and_params()
        mesh = self._mesh((8, 1))
        x = jax.random.normal(jax.random.PRNGKey(3), (16, N, D), jnp.float32)
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))

        out, _ = jax.jit(
            lambda x: fused_vit_block(x, params, num_heads=H))(xs)
        out_spec = out.sharding.spec
        assert len(out_spec) >= 1 and out_spec[0] == "data", out_spec


@tpu_only
def test_model_fused_no_features_returns_none():
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=D, depth=2,
                    num_heads=H, num_classes=10)
    m = VisionTransformer(cfg, dtype=jnp.bfloat16, block_fn=fused_vit_block,
                          collect_features=False)
    params = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 32, 32, 3)))["params"]
    out = m.apply({"params": params},
                  jnp.zeros((B, 32, 32, 3)), train=False)
    assert all(f is None for f in out.features)
    assert out.logits.shape == (B, 10)


class TestBlockPair:
    """Two-blocks-per-kernel path (fused_vit_block_pair + the model pairing
    loop) vs the single-block fused model — interpret mode, so the exact
    production kernel code runs on CPU. Covers odd depth (trailing single
    block), per-position feature collection, and gradients."""

    @pytest.fixture(autouse=True)
    def _interpret(self):
        from deltakd_tpu.ops import fused_block
        fused_block.set_interpret(True)
        yield
        fused_block.set_interpret(False)

    def _models(self, depth, collect=True):
        from deltakd_tpu.ops.fused_block import fused_vit_block_pair

        cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=D, depth=depth,
                        num_heads=H, num_classes=10, distilled=True)
        single = VisionTransformer(cfg, dtype=jnp.bfloat16,
                                   block_fn=fused_vit_block,
                                   collect_features=collect)
        paired = VisionTransformer(cfg, dtype=jnp.bfloat16,
                                   block_fn=fused_vit_block,
                                   block_pair_fn=fused_vit_block_pair,
                                   collect_features=collect)
        params = single.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, 32, 32, 3)))["params"]
        p2 = paired.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 32, 32, 3)))["params"]
        assert jax.tree.map(jnp.shape, params) == jax.tree.map(jnp.shape, p2)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 32, 32, 3),
                              jnp.float32)
        return single, paired, params, x

    @pytest.mark.parametrize("depth", [2, 3])
    def test_forward_matches_single(self, depth):
        single, paired, params, x = self._models(depth)
        o_s = single.apply({"params": params}, x, train=False)
        o_p = paired.apply({"params": params}, x, train=False)
        scale = float(jnp.max(jnp.abs(o_s.logits))) + 1e-6
        assert float(jnp.max(jnp.abs(o_p.logits - o_s.logits))) < 0.02 * scale
        assert len(o_p.features) == depth
        for fp, fs in zip(o_p.features, o_s.features):
            s = float(jnp.max(jnp.abs(fs.astype(jnp.float32)))) + 1e-6
            assert float(jnp.max(jnp.abs(fp.astype(jnp.float32)
                                         - fs.astype(jnp.float32)))) < 0.02 * s

    def test_partial_feature_collection(self):
        # only block 1 of a depth-2 pair collects: nf1=False, nf2=True variant
        single, paired, params, x = self._models(2, collect=frozenset({1}))
        o_p = paired.apply({"params": params}, x, train=False)
        assert o_p.features[0] is None and o_p.features[1] is not None

    def test_gradients_match_single(self):
        single, paired, params, x = self._models(2)

        def loss(m):
            def f(p):
                out = m.apply({"params": p}, x, train=True)
                return (jnp.sum(out.logits.astype(jnp.float32) ** 2)
                        + sum(jnp.sum(f_.astype(jnp.float32) ** 2)
                              for f_ in out.features if f_ is not None))
            return f

        g_s = jax.grad(loss(single))(params)
        g_p = jax.grad(loss(paired))(params)
        flat_s = jax.tree_util.tree_leaves_with_path(g_s)
        flat_p = jax.tree.leaves(g_p)
        for (path, a), b in zip(flat_s, flat_p):
            a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
            s = np.abs(a32).max() + 1e-5
            assert np.abs(a32 - b32).max() < 0.03 * s, (
                jax.tree_util.keystr(path), np.abs(a32 - b32).max(), s)
