"""Golden-value tests: every distillation objective vs the reference's torch
formulas (reference model/loss.py), sharing weights and randomness."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deltakd_tpu.kd import KDSettings, init_aux_params
from deltakd_tpu.kd import losses as L
from deltakd_tpu.kd.losses import rank_k_targets
from deltakd_tpu.kd.sinkhorn import sinkhorn_divergence

from tests import torch_ref as TR

B, N_S, N_T, D_S, D_T = 4, 17, 18, 48, 64  # 16 patches (4x4 grid) + prefix
DEPTH = 12


def _features(seed):
    rng = np.random.RandomState(seed)
    s_feats = [rng.randn(B, N_S, D_S).astype(np.float32) for _ in range(DEPTH)]
    t_feats = [rng.randn(B, N_T, D_T).astype(np.float32) for _ in range(DEPTH)]
    return s_feats, t_feats


def _aux(dtype, **kw):
    return init_aux_params(jax.random.PRNGKey(7), dtype, D_S, D_T, **kw)


def _t(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_soft_kd_matches_torch():
    rng = np.random.RandomState(0)
    s = rng.randn(B, 100).astype(np.float32)
    t = rng.randn(B, 100).astype(np.float32)
    ours = L.soft_kd_loss(jnp.asarray(s), jnp.asarray(t), tau=3.0)
    ref = TR.torch_soft_kd(_t(s), _t(t), 3.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=5e-4)


def test_hard_kd_matches_torch():
    rng = np.random.RandomState(0)
    s = rng.randn(B, 100).astype(np.float32)
    t = rng.randn(B, 100).astype(np.float32)
    ours = L.hard_kd_loss(jnp.asarray(s), jnp.asarray(t))
    ref = TR.torch_hard_kd(_t(s), _t(t))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_base_criteria_match_timm_formulas():
    rng = np.random.RandomState(0)
    logits = rng.randn(B, 10).astype(np.float32)
    labels = np.array([1, 2, 3, 4])
    soft_targets = rng.rand(B, 10).astype(np.float32)
    soft_targets /= soft_targets.sum(1, keepdims=True)

    # timm SoftTargetCrossEntropy
    ours = L.soft_target_cross_entropy(jnp.asarray(logits), jnp.asarray(soft_targets))
    ref = torch.mean(torch.sum(-_t(soft_targets) * F.log_softmax(_t(logits), dim=-1), dim=-1))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    # timm LabelSmoothingCrossEntropy
    ours = L.label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.1)
    logp = F.log_softmax(_t(logits), dim=-1)
    nll = F.nll_loss(logp, torch.from_numpy(labels))
    smooth = -logp.mean(dim=-1).mean()
    ref = 0.9 * nll + 0.1 * smooth
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_vitkd_matches_torch():
    s_feats, t_feats = _features(1)
    aux = _aux("vitkd")
    kd = KDSettings(distillation_type="vitkd")
    key = jax.random.PRNGKey(3)
    ours = L.vitkd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                        [jnp.asarray(f) for f in t_feats], key)

    noise = np.asarray(jax.random.uniform(key, (B, N_S - 1)))
    align2 = [TR.np_to_torch_linear(p) for p in aux["align2"]]
    align = TR.np_to_torch_linear(aux["align"])
    gen1 = TR.np_to_torch_conv3x3(aux["generation"]["conv1"])
    gen2 = TR.np_to_torch_conv3x3(aux["generation"]["conv2"])
    with torch.no_grad():
        ref = TR.torch_vitkd([_t(f) for f in s_feats], [_t(f) for f in t_feats],
                             align2, align, _t(aux["mask_token"]), gen1, gen2,
                             _t(noise))
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_mgd_matches_torch():
    s_feats, t_feats = _features(2)
    aux = _aux("mgd")
    kd = KDSettings(distillation_type="mgd", mgd_mask_ratio=0.5, mgd_alpha=7e-5)
    key = jax.random.PRNGKey(11)
    ours = L.mgd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                      [jnp.asarray(f) for f in t_feats], key)
    noise = np.asarray(jax.random.uniform(key, (B, N_S - 1)))
    with torch.no_grad():
        ref = TR.torch_mgd(_t(s_feats[-1]), _t(t_feats[-1]),
                           TR.np_to_torch_linear(aux["align"]),
                           _t(aux["mask_token"]),
                           TR.np_to_torch_conv3x3(aux["generation"]["conv1"]),
                           TR.np_to_torch_conv3x3(aux["generation"]["conv2"]),
                           _t(noise), 0.5, 7e-5)
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


@pytest.mark.parametrize("method", [1, 2, 3])
def test_saliency_mgd_matches_torch(method):
    s_feats, t_feats = _features(3)
    aux = _aux("saliency_mgd", saliency_method=method)
    kd = KDSettings(distillation_type="saliency_mgd", saliency_method=method,
                    saliency_mask_ratio=0.5)
    ours = L.saliency_mgd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                               [jnp.asarray(f) for f in t_feats])

    if method in (1, 2):
        attn = TR.TorchSimpleAttention(D_T, 8)
        with torch.no_grad():
            lin = TR.np_to_torch_linear(aux["saliency_attn"]["qk"])
            attn.qk.weight.copy_(lin.weight)
            attn.qk.bias.copy_(lin.bias)
    else:
        attn = TR.TorchSimpleCrossAttention(D_T, 8)
        with torch.no_grad():
            q = TR.np_to_torch_linear(aux["saliency_attn"]["q"])
            k = TR.np_to_torch_linear(aux["saliency_attn"]["k"])
            attn.q.weight.copy_(q.weight); attn.q.bias.copy_(q.bias)
            attn.k.weight.copy_(k.weight); attn.k.bias.copy_(k.bias)
    with torch.no_grad():
        ref = TR.torch_saliency_mgd(
            _t(s_feats[-1]), _t(t_feats[-1]), TR.np_to_torch_linear(aux["align"]),
            _t(aux["mask_token"]),
            TR.np_to_torch_conv3x3(aux["generation"]["conv1"]),
            TR.np_to_torch_conv3x3(aux["generation"]["conv2"]),
            attn, 0.5, method)
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_curkd_all_phases_match_torch():
    s_feats, t_feats = _features(4)
    aux = _aux("curkd")
    kd = KDSettings(distillation_type="curkd")
    key = jax.random.PRNGKey(13)
    sj = [jnp.asarray(f) for f in s_feats]
    tj = [jnp.asarray(f) for f in t_feats]
    st = [_t(f) for f in s_feats]
    tt = [_t(f) for f in t_feats]

    with torch.no_grad():
        early = TR.torch_curkd_early(
            st, tt, [TR.np_to_torch_linear(p) for p in aux["curkd_align_early"]],
            [0, 1, 2], 3.0)
        mid = TR.torch_curkd_early(
            st, tt, [TR.np_to_torch_linear(p) for p in aux["curkd_align_mid"]],
            [3, 4, 5, 6], 4.0)
        noise = np.asarray(jax.random.uniform(key, (B, N_S - 1)))
        last = TR.torch_curkd_last(
            st, tt, TR.np_to_torch_linear(aux["curkd_align_last"]),
            _t(aux["mask_token"]),
            TR.np_to_torch_conv3x3(aux["generation"]["conv1"]),
            TR.np_to_torch_conv3x3(aux["generation"]["conv2"]), _t(noise))

    for epoch, ref in [(0, early), (99, early), (100, mid), (150, mid),
                       (151, last), (299, last)]:
        ours = L.curkd_loss(kd, aux, sj, tj, key, jnp.asarray(epoch))
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4,
                                   err_msg=f"epoch {epoch}")


def test_wasskd_l1_matches_torch():
    s_feats, t_feats = _features(5)
    aux = _aux("wasskd")
    kd = KDSettings(distillation_type="wasskd", wasskd_type="l1")
    ours = L.wasskd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                         [jnp.asarray(f) for f in t_feats])
    with torch.no_grad():
        ref = TR.torch_wasskd_l1([_t(f) for f in s_feats], [_t(f) for f in t_feats],
                                 [TR.np_to_torch_linear(p) for p in aux["align_wasskd"]])
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_diffkd_matches_torch():
    s_feats, t_feats = _features(6)
    aux = _aux("diffkd")
    kd = KDSettings(distillation_type="diffkd")
    key = jax.random.PRNGKey(17)
    # train=False → dropout off, deterministic given the key
    ours = L.diffkd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                         [jnp.asarray(f) for f in t_feats], key, train=False)

    # replicate the documented key-splitting scheme
    k_t, k_rest = jax.random.split(key)
    t_step = np.asarray(jax.random.randint(k_t, (B,), 0, 8))
    noises = []
    for i in range(3):
        k_noise, _ = jax.random.split(jax.random.fold_in(k_rest, i))
        noises.append(_t(np.asarray(jax.random.normal(k_noise, (B, N_T - 2, D_T)))))

    dn = aux["denoise"]
    with torch.no_grad():
        ref = TR.torch_diffkd(
            [_t(f[:, 1:]) for f in (s_feats[0], s_feats[1], s_feats[-1])],
            [_t(f[:, 2:]) for f in (t_feats[0], t_feats[1], t_feats[-1])],
            [TR.np_to_torch_linear(p) for p in aux["align"]],
            TR.np_to_torch_linear(dn["time1"]), TR.np_to_torch_linear(dn["time2"]),
            TR.np_to_torch_linear(dn["net1"]), TR.np_to_torch_linear(dn["net2"]),
            torch.from_numpy(t_step), noises)
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_lrkd_rank_targets_match_svd_up_to_sign():
    rng = np.random.RandomState(8)
    a = rng.randn(64, 32).astype(np.float32)
    rank = 8
    ours = np.asarray(rank_k_targets(jnp.asarray(a), rank))
    U, S, _ = torch.linalg.svd(_t(a), full_matrices=False)
    ref = (U[:, :rank] @ torch.diag(S[:rank])).numpy()
    # align per-column signs (SVD sign ambiguity)
    for j in range(rank):
        if np.dot(ours[:, j], ref[:, j]) < 0:
            ref[:, j] = -ref[:, j]
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_lrkd_loss_formula():
    """Weighting/reduction semantics (mean-MSE, α/β/γ combine) against a torch
    computation using our (deterministic) spectral targets."""
    s_feats, t_feats = _features(9)
    aux = _aux("lrkd", lrkd_rank=8)
    kd = KDSettings(distillation_type="lrkd", lrkd_rank=8, lrkd_alpha=0.2,
                    lrkd_beta=0.15, lrkd_gamma=0.1)
    ours = L.lrkd_loss(kd, aux, [jnp.asarray(f) for f in s_feats],
                       [jnp.asarray(f) for f in t_feats])

    weights = [0.2, 0.15, 0.1]
    ref = 0.0
    for w, a_params, si, ti in zip(weights, aux["align"], (0, 1, -1), (0, 1, 11)):
        s = s_feats[si][:, 1:].reshape(-1, D_S)
        t = t_feats[ti][:, 2:].reshape(-1, D_T)
        target = np.asarray(rank_k_targets(jnp.asarray(t), 8))
        with torch.no_grad():
            s_aligned = TR.np_to_torch_linear(a_params)(_t(s))
        ref += w * float(F.mse_loss(_t(target), s_aligned))
    np.testing.assert_allclose(float(ours), ref, rtol=2e-4)


def test_sinkhorn_divergence_properties():
    """No geomloss available anywhere (reference bug B3, SURVEY.md) — validate
    mathematical properties instead: S(x,x)=0, symmetry, positivity, and
    convergence toward true OT for a case with a known value."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (32, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (32, 8)) + 1.0

    s_xx = float(sinkhorn_divergence(x, x))
    assert abs(s_xx) < 1e-5

    s_xy = float(sinkhorn_divergence(x, y))
    s_yx = float(sinkhorn_divergence(y, x))
    assert s_xy > 0
    # Gauss-Seidel visits (f,g) in opposite order for (y,x), so symmetry
    # holds only to solver tolerance — ~3e-4 at the default 20+6 ε-levels
    # (1e-5 needed the old 30+10 schedule; the exact-OT test separately pins
    # absolute accuracy at 2%)
    np.testing.assert_allclose(s_xy, s_yx, rtol=1e-3)

    # translation of a point cloud by v: W2²/2 = |v|²/2 (blur→0 limit);
    # with blur=0.05 the entropic bias is tiny after debiasing
    v = jnp.ones((8,)) * 0.5
    s_shift = float(sinkhorn_divergence(x, x + v))
    np.testing.assert_allclose(s_shift, float(jnp.sum(v * v)) / 2, rtol=0.05)


def test_sinkhorn_matches_exact_ot_assignment():
    """Ground truth: for uniform equal-size clouds, exact OT is an assignment
    problem — scipy.optimize.linear_sum_assignment on the half-squared-
    Euclidean cost gives the blur→0 limit of the debiased divergence
    (geomloss conventions, reference model/loss.py:200-223)."""
    import pytest

    linear_sum_assignment = pytest.importorskip(
        "scipy.optimize").linear_sum_assignment

    rng = np.random.RandomState(3)
    for n, d in ((12, 4), (24, 6)):
        x = rng.randn(n, d).astype(np.float32)
        y = (rng.randn(n, d) * 0.8 + 0.5).astype(np.float32)
        C = (np.sum((x[:, None] - y[None, :]) ** 2, axis=-1) / 2.0)
        r, c = linear_sum_assignment(C)
        exact = C[r, c].mean()
        ours = float(sinkhorn_divergence(jnp.asarray(x), jnp.asarray(y),
                                         blur=0.01, n_iters=60, n_final=30))
        # entropic bias at blur=0.01 is far below 2%
        np.testing.assert_allclose(ours, exact, rtol=0.02)


def test_sinkhorn_single_point_closed_form():
    """Hand-computable finite-blur case: 1-point clouds force the plan, so
    OT_ε(x,y) = |x-y|²/2 exactly and both debias terms are 0 at any ε."""
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    y = jnp.asarray([[-1.0, 0.5, 2.0]])
    expected = float(jnp.sum((x - y) ** 2)) / 2.0
    for blur in (0.05, 0.5):
        got = float(sinkhorn_divergence(x, y, blur=blur, n_iters=20))
        np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_total_loss_combine_semantics():
    """α-weighted vs additive vs base+5·distill combine split (SURVEY.md §2.3)."""
    rng = np.random.RandomState(10)
    logits = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    dist_logits = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    t_logits = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    labels = jnp.asarray(np.array([1, 2, 3, 4]))
    s_feats, t_feats = _features(11)
    sj = [jnp.asarray(f) for f in s_feats]
    tj = [jnp.asarray(f) for f in t_feats]
    key = jax.random.PRNGKey(0)

    # soft: weighted
    kd = KDSettings(distillation_type="soft", alpha=0.3, mixup_active=False)
    total, m = L.total_loss(kd, student_logits=logits, student_dist_logits=dist_logits,
                            student_feats=None, teacher_logits=t_logits,
                            teacher_feats=None, aux_params={}, targets=labels)
    np.testing.assert_allclose(
        float(total), 0.7 * float(m["base_loss"]) + 0.3 * float(m["distill_loss"]),
        rtol=1e-6)

    # mgd: additive
    aux = _aux("mgd")
    kd = KDSettings(distillation_type="mgd", alpha=0.3, mixup_active=False)
    total, m = L.total_loss(kd, student_logits=logits, student_dist_logits=None,
                            student_feats=sj, teacher_logits=t_logits,
                            teacher_feats=tj, aux_params=aux, targets=labels, rng=key)
    np.testing.assert_allclose(
        float(total), float(m["base_loss"]) + float(m["distill_loss"]), rtol=1e-6)

    # wasskd: base + 5*distill
    aux = _aux("wasskd")
    kd = KDSettings(distillation_type="wasskd", mixup_active=False)
    total, m = L.total_loss(kd, student_logits=logits, student_dist_logits=None,
                            student_feats=sj, teacher_logits=t_logits,
                            teacher_feats=tj, aux_params=aux, targets=labels, rng=key)
    np.testing.assert_allclose(
        float(total), float(m["base_loss"]) + 5.0 * float(m["distill_loss"]), rtol=1e-6)

    # none: base only, and soft/hard without dist head raises
    kd = KDSettings(distillation_type="none", mixup_active=False)
    total, m = L.total_loss(kd, student_logits=logits, student_dist_logits=None,
                            student_feats=None, teacher_logits=None,
                            teacher_feats=None, aux_params={}, targets=labels)
    np.testing.assert_allclose(float(total), float(m["base_loss"]), rtol=1e-7)

    kd = KDSettings(distillation_type="soft", mixup_active=False)
    with pytest.raises(ValueError):
        L.total_loss(kd, student_logits=logits, student_dist_logits=None,
                     student_feats=None, teacher_logits=t_logits,
                     teacher_feats=None, aux_params={}, targets=labels)


def test_subspace_eigvecs_match_eigh_on_decaying_spectrum():
    """The matmul-only top-k solver must reproduce eigh's targets on
    realistic (fast-decaying) feature spectra."""
    from deltakd_tpu.kd.losses import topk_eigvecs_subspace

    rng = np.random.RandomState(0)
    d, rank = 96, 16
    # construct SPD with geometric spectrum (like ViT feature Grams)
    q, _ = np.linalg.qr(rng.randn(d, d))
    evals = 1000.0 * (0.7 ** np.arange(d))
    gram = (q * evals) @ q.T
    gram = jnp.asarray(0.5 * (gram + gram.T), jnp.float32)

    v_sub = np.asarray(topk_eigvecs_subspace(gram, rank))
    _, v_full = np.linalg.eigh(np.asarray(gram))
    v_ref = v_full[:, ::-1][:, :rank]
    # compare projectors (sign/rotation-invariant)
    p_sub = v_sub @ v_sub.T
    p_ref = v_ref @ v_ref.T
    np.testing.assert_allclose(p_sub, p_ref, atol=1e-3)


@pytest.mark.parametrize("dtype_name", ["vitkd", "lrkd", "diffkd", "curkd",
                                        "saliency_mgd", "wasskd", "mgd"])
def test_feature_indices_cover_loss_reads_at_depth_24(dtype_name):
    """Selective collection (kd.losses.feature_indices) must cover every
    block index a loss body reads, at depths other than 12 too — under the
    fused kernel the uncollected features are None, so a stale hardcoded
    index (e.g. lrkd's old t_feats[11]) crashes at trace time."""
    from deltakd_tpu.kd.losses import feature_indices

    depth = 24
    idx = feature_indices(dtype_name, depth)
    assert isinstance(idx, frozenset)
    rng = np.random.RandomState(0)

    def feats(n_tok, dim):
        return [jnp.asarray(rng.randn(2, n_tok, dim).astype(np.float32))
                if i in idx else None for i in range(depth)]

    s_feats = feats(17, D_S)   # 16 patches + CLS
    t_feats = feats(18, D_T)   # 16 patches + CLS + DIST
    aux = _aux(dtype_name, lrkd_rank=8) if dtype_name == "lrkd" else _aux(dtype_name)
    kd = KDSettings(distillation_type=dtype_name, lrkd_rank=8,
                    sinkhorn_iters=4)
    kwargs = {}
    if dtype_name in ("vitkd", "diffkd", "curkd", "mgd"):
        kwargs["rng"] = jax.random.PRNGKey(0)
    if dtype_name == "curkd":
        # lax.switch traces ALL phases, touching every curriculum index
        kwargs["epoch"] = jnp.asarray(0, jnp.int32)
    fn = getattr(L, f"{dtype_name}_loss")
    loss = fn(kd, aux, s_feats, t_feats, **kwargs)
    assert np.isfinite(float(loss))
