"""Training-*dynamics* equivalence vs the reference torch stack (~200 steps).

The golden tests in test_losses.py pin every per-step loss *formula*; nothing
there would catch a semantic slip in optax AdamW vs timm AdamW (weight-decay
application order, wd masking of the grafted aux heads), an off-by-one in the
per-epoch cosine schedule, gradient-clipping order, or EMA drift — any of
which silently changes final top-1. Here the full stack — same init (via the
timm importer), same data, same mask noise — trains for 200 steps in both
frameworks and the loss trajectory + parameter norms must track.

Reference semantics being mirrored on the torch side:
  * timm 0.9.12 ``create_optimizer`` → AdamW with param groups split by
    ``ndim <= 1 or name.endswith('.bias') or name in model.no_weight_decay()``
    (reference tools/train.py:264) — so pos_embed/cls_token/dist_token skip
    decay but the grafted ``mask_token`` (model/models.py:84) receives it;
  * timm CosineLRScheduler stepped per *epoch* (train.py:333),
    warmup_prefix=False;
  * clip_grad_norm_ before the step (tools/engine.py:58-62 NativeScaler);
  * ModelEma: ema = d·ema + (1−d)·p after each step (train.py:300-301);
  * loss combine: (1−α)·base + α·soft for logit KD, base + distill for MGD
    (model/loss.py:36-54, 242).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from deltakd_tpu.configs import TrainConfig
from deltakd_tpu.kd import KDSettings, init_aux_params
from deltakd_tpu.kd.losses import total_loss
from deltakd_tpu.models.import_timm import timm_to_flax
from deltakd_tpu.models.vit import ViTConfig, VisionTransformer
from deltakd_tpu.train.optim import make_optimizer
from deltakd_tpu.train.state import TrainState

from tests import torch_ref as TR

IMG, PATCH = 32, 16            # 4 patches (2x2 grid)
S_DIM, T_DIM, DEPTH, HEADS = 32, 48, 3, 2
C, B, NB = 10, 8, 4            # classes, batch, distinct batches
STEPS = 200
SPE = 4                        # steps per epoch → 50 schedule epochs
EMA_DECAY = 0.95

HP = dict(lr=5e-4, warmup_lr=1e-6, min_lr=1e-5, warmup_epochs=3, epochs=50,
          weight_decay=0.05, clip=1.0, betas=(0.9, 0.999), eps=1e-8)


def _lr_at_step(step: int) -> float:
    """timm CosineLRScheduler(t_initial=epochs, warmup_prefix=False) stepped
    at integer epochs — independent reimplementation for the torch side."""
    epoch = step // SPE
    if epoch < HP["warmup_epochs"]:
        return HP["warmup_lr"] + epoch * (HP["lr"] - HP["warmup_lr"]) / HP["warmup_epochs"]
    if epoch >= HP["epochs"]:
        return HP["min_lr"]
    return HP["min_lr"] + 0.5 * (HP["lr"] - HP["min_lr"]) * (
        1 + math.cos(math.pi * epoch / HP["epochs"]))


def _data(seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(NB, B, IMG, IMG, 3).astype(np.float32)
    labels = rng.randint(0, C, (NB, B)).astype(np.int64)
    return images, labels


def _make_pair(distilled: bool, seed: int, dim: int = S_DIM,
               depth: int = DEPTH):
    """(torch model, jax module, synced flax params) with identical weights."""
    torch.manual_seed(seed)
    t_model = TR.TorchViT(img_size=IMG, patch=PATCH, dim=dim, depth=depth,
                          num_heads=HEADS, num_classes=C, distilled=distilled)
    j_module = VisionTransformer(
        ViTConfig(img_size=IMG, patch_size=PATCH, embed_dim=dim, depth=depth,
                  num_heads=HEADS, num_classes=C, distilled=distilled),
        dtype=jnp.float32)
    init = j_module.init({"params": jax.random.PRNGKey(seed)},
                         jnp.zeros((1, IMG, IMG, 3)))["params"]
    state = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    params, report = timm_to_flax(state, init)
    assert not report["skipped"], report["skipped"]
    return t_model, j_module, params


def _torch_param_groups(named_params):
    """timm param_groups_weight_decay semantics (see module docstring)."""
    no_decay_names = ("pos_embed", "cls_token", "dist_token")
    decay, no_decay = [], []
    for name, p in named_params:
        if p.ndim <= 1 or name.endswith(".bias") or name in no_decay_names:
            no_decay.append(p)
        else:
            decay.append(p)
    return [{"params": decay, "weight_decay": HP["weight_decay"]},
            {"params": no_decay, "weight_decay": 0.0}]


def _global_norm_torch(params):
    return math.sqrt(sum(float((p.detach() ** 2).sum()) for p in params))


def _global_norm_jax(tree):
    return math.sqrt(sum(float(jnp.sum(x.astype(jnp.float32) ** 2))
                         for x in jax.tree.leaves(tree)))


def _run_torch(t_student, t_teacher, aux_modules, loss_fn, images, labels):
    named = list(t_student.named_parameters()) + [
        (n, p) for m in aux_modules for n, p in m.named_parameters()]
    all_params = [p for _, p in named]
    opt = torch.optim.AdamW(_torch_param_groups(named), lr=HP["lr"],
                            betas=HP["betas"], eps=HP["eps"])
    ema = [p.detach().clone() for p in all_params]
    losses = []
    for s in range(STEPS):
        for g in opt.param_groups:
            g["lr"] = _lr_at_step(s)
        b = s % NB
        x = torch.from_numpy(images[b]).permute(0, 3, 1, 2).contiguous()
        y = torch.from_numpy(labels[b])
        loss = loss_fn(t_student, t_teacher, x, y, s)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(all_params, HP["clip"])
        opt.step()
        with torch.no_grad():
            for e, p in zip(ema, all_params):
                e.mul_(EMA_DECAY).add_(p, alpha=1 - EMA_DECAY)
        losses.append(float(loss))
    return np.array(losses), all_params, ema


def _run_jax(j_student, j_teacher, params, t_params, aux, kd, jax_loss,
             images, labels, epoch_offset: int = 0):
    cfg = TrainConfig(
        distillation_type=kd.distillation_type, lr=HP["lr"],
        warmup_lr=HP["warmup_lr"], min_lr=HP["min_lr"],
        warmup_epochs=HP["warmup_epochs"], epochs=HP["epochs"],
        weight_decay=HP["weight_decay"], clip_grad=HP["clip"],
        opt="adamw", opt_eps=HP["eps"], dataset="cifar-100",
        ema_decay=EMA_DECAY, dtype="float32")
    tx = make_optimizer(cfg, {"student": params, "aux": aux}, SPE)
    state = TrainState.create(student_params=params, aux_params=aux, tx=tx,
                              ema_decay=EMA_DECAY)

    @jax.jit
    def step(state, x, y, k_loss, ep):
        def loss_of(p):
            return jax_loss(p, x, y, k_loss, ep)
        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads=grads, tx=tx,
                                     ema_decay=EMA_DECAY), loss

    losses = []
    for s in range(STEPS):
        b = s % NB
        state, loss = step(state, jnp.asarray(images[b]),
                           jnp.asarray(labels[b].astype(np.int32)),
                           jax.random.fold_in(jax.random.PRNGKey(99), s),
                           jnp.asarray(epoch_offset + s // SPE, jnp.int32))
        losses.append(float(loss))
    return np.array(losses), state


def _assert_tracks(torch_losses, jax_losses, torch_norm, jax_norm,
                   torch_ema_norm, jax_ema_norm):
    # trajectories must track point-for-point, not just on average — an
    # off-by-one-epoch schedule shows up as a growing pointwise gap
    rel = np.abs(torch_losses - jax_losses) / (np.abs(torch_losses) + 1e-6)
    assert rel.max() < 2e-2, f"loss trajectories diverge: max rel {rel.max():.3e}"
    assert rel.mean() < 4e-3, f"mean rel loss gap {rel.mean():.3e}"
    np.testing.assert_allclose(jax_norm, torch_norm, rtol=2e-4,
                               err_msg="final param norm drift")
    np.testing.assert_allclose(jax_ema_norm, torch_ema_norm, rtol=2e-4,
                               err_msg="final EMA norm drift")


def test_soft_kd_dynamics_match_torch_200_steps():
    """Logit KD: distilled student, (1−α)·smoothed-CE + α·soft (τ=2)."""
    alpha, tau = 0.5, 2.0
    images, labels = _data(0)
    t_student, j_student, s_params = _make_pair(True, seed=1)
    t_teacher, j_teacher, t_params = _make_pair(False, seed=2, dim=T_DIM)
    kd = KDSettings(distillation_type="soft", alpha=alpha, tau=tau,
                    smoothing=0.1, mixup_active=False,
                    student_prefix=2, teacher_prefix=1)

    def torch_loss(student, teacher, x, y, s):
        cls_logits, dist_logits, _ = student.forward_with_features(x)
        with torch.no_grad():
            t_logits = teacher(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        soft = TR.torch_soft_kd(dist_logits, t_logits, tau)
        return (1 - alpha) * base + alpha * soft

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True,
                              distilled_training=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=out.logits_dist,
                             student_feats=None,
                             teacher_logits=t_out.logits, teacher_feats=None,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(t_student, t_teacher, [],
                                            torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params, {},
                                 kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_mgd_dynamics_match_torch_200_steps():
    """Feature KD: aux heads (align / mask_token / generation convs)
    co-training with the student under the same optimizer — the reference
    grafts them onto the model so they ride model.parameters()
    (model/models.py:134, tools/train.py:264)."""
    images, labels = _data(3)
    t_student, j_student, s_params = _make_pair(False, seed=4)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=5, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(6), "mgd", S_DIM, T_DIM)
    kd = KDSettings(distillation_type="mgd", smoothing=0.1, mixup_active=False,
                    mgd_alpha=7e-2, mgd_mask_ratio=0.5,
                    student_prefix=1, teacher_prefix=2)

    align = TR.np_to_torch_linear(aux["align"])
    gen1 = TR.np_to_torch_conv3x3(aux["generation"]["conv1"])
    gen2 = TR.np_to_torch_conv3x3(aux["generation"]["conv2"])
    mask_token = torch.nn.Parameter(
        torch.from_numpy(np.asarray(aux["mask_token"], np.float32)))
    holder = torch.nn.Module()
    holder.mask_token = mask_token  # named 'mask_token' → weight-decayed

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        k = jax.random.fold_in(jax.random.PRNGKey(99), s)
        noise = torch.from_numpy(
            np.asarray(jax.random.uniform(k, (B, (IMG // PATCH) ** 2))))
        mgd = TR.torch_mgd(s_feats[-1], t_feats[-1].detach(), align,
                           mask_token, gen1, gen2, noise,
                           kd.mgd_mask_ratio, kd.mgd_alpha)
        return base + mgd

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(
        t_student, t_teacher, [align, gen1, gen2, holder], torch_loss,
        images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_lrkd_dynamics_match_torch_200_steps():
    """LRKD: gradients flow through the align heads toward spectral targets
    computed by our Gram-eigh solver vs torch full SVD (reference
    model/loss.py:314-330). Both sides canonicalize the eigenvector column
    signs (largest-|.| entry positive, kd/losses.py:_canon_sign), which pins
    the otherwise-arbitrary LAPACK sign and makes trajectories comparable."""
    alpha, rank = 0.5, 8
    la, lb, lg = 0.2, 0.15, 0.1
    images, labels = _data(7)
    t_student, j_student, s_params = _make_pair(False, seed=8)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=9, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(10), "lrkd", S_DIM, T_DIM,
                          lrkd_rank=rank)
    kd = KDSettings(distillation_type="lrkd", alpha=alpha, lrkd_rank=rank,
                    lrkd_alpha=la, lrkd_beta=lb, lrkd_gamma=lg, smoothing=0.1,
                    mixup_active=False, student_prefix=1, teacher_prefix=2)
    aligns = [TR.np_to_torch_linear(p) for p in aux["align"]]

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        distill = 0.0
        for w, a, i in zip((la, lb, lg), aligns, (0, 1, -1)):
            t2 = t_feats[i][:, 2:].detach().reshape(-1, T_DIM)
            _, _, Vh = torch.linalg.svd(t2, full_matrices=False)
            V = Vh.T[:, :rank]
            sgn = torch.sign(V[V.abs().argmax(dim=0), torch.arange(rank)])
            target = (t2 @ (V * sgn)).detach()
            s2 = a(s_feats[i][:, 1:]).reshape(-1, rank)
            distill = distill + w * F.mse_loss(target, s2)
        return (1 - alpha) * base + alpha * distill

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(t_student, t_teacher, aligns,
                                            torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_diffkd_dynamics_match_torch_200_steps():
    """DiffKD: the denoiser network co-trains with the student and align
    heads (reference model/loss.py:105-155) — timesteps, injected noise and
    denoiser dropout masks are generated from the same JAX keys on both
    sides, so the trajectories must track pointwise."""
    alpha = 0.5
    images, labels = _data(11)
    t_student, j_student, s_params = _make_pair(False, seed=12)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=13, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(14), "diffkd", S_DIM, T_DIM)
    kd = KDSettings(distillation_type="diffkd", alpha=alpha, smoothing=0.1,
                    mixup_active=False, student_prefix=1, teacher_prefix=2)
    aligns = [TR.np_to_torch_linear(p) for p in aux["align"]]
    net1 = TR.np_to_torch_linear(aux["denoise"]["net1"])
    net2 = TR.np_to_torch_linear(aux["denoise"]["net2"])
    time1 = TR.np_to_torch_linear(aux["denoise"]["time1"])
    time2 = TR.np_to_torch_linear(aux["denoise"]["time2"])
    T_STEPS = 8

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        # identical randomness: mirror diffkd_loss's key-splitting exactly
        key = jax.random.fold_in(jax.random.PRNGKey(99), s)
        k_t, k_rest = jax.random.split(key)
        t_step = torch.from_numpy(np.asarray(
            jax.random.randint(k_t, (B,), 0, T_STEPS)).astype(np.int64))
        sigma_max = torch.where(t_step < T_STEPS // 2, torch.tensor(0.3),
                                torch.tensor(0.7))
        sigma_t = (1 - torch.cos(math.pi * t_step.float() / T_STEPS)) * sigma_max
        feat = 0.0
        for i, (a, li) in enumerate(zip(aligns, (0, 1, -1))):
            k_noise, k_drop = jax.random.split(
                jax.random.fold_in(k_rest, i))
            t_feat = t_feats[li][:, 2:].detach()
            t_n = t_feat / t_feat.norm(dim=-1, keepdim=True)
            s_al = a(s_feats[li][:, 1:])
            s_n = s_al / s_al.norm(dim=-1, keepdim=True)
            eps = torch.from_numpy(np.asarray(
                jax.random.normal(k_noise, tuple(t_n.shape)), np.float32))
            noise = eps * sigma_t.view(-1, 1, 1)
            noisy = t_n + noise
            t_emb = time2(F.gelu(time1(t_step.float().view(-1, 1))))
            h = net2(F.gelu(net1(noisy + t_emb.unsqueeze(1))))
            keep = torch.from_numpy(np.asarray(
                jax.random.bernoulli(k_drop, 0.9, tuple(h.shape))))
            pred = torch.where(keep, h / 0.9, torch.zeros(()))
            feat = feat + F.mse_loss(pred, noise)
            w_t = 1.0 / (sigma_t ** 2 + 1e-8)
            feat = feat + w_t.mean() * F.mse_loss(s_n, t_n)
        return (1 - alpha) * base + alpha * (feat / 3 * 5e-5)

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(
        t_student, t_teacher, [net1, net2, time1, time2] + aligns,
        torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_curkd_dynamics_cross_phase_boundary():
    """CurKD crossing the epoch-100 curriculum boundary (reference
    model/loss.py:362-420): curriculum epochs 95→144, so steps 0-19 train the
    early-phase heads and steps 20+ the mid-phase heads, inside ONE compiled
    step via lax.switch. Torch adds a 0-weighted sum over every aux param so
    inactive heads get zero grads (not None) — matching optax, where AdamW's
    decoupled weight decay applies to all co-trained aux heads every step."""
    EPOCH_OFFSET, DEPTH_C = 95, 7  # mid phase needs blocks 3-6
    images, labels = _data(15)
    t_student, j_student, s_params = _make_pair(False, seed=16, depth=DEPTH_C)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=17, dim=T_DIM,
                                                depth=DEPTH_C)
    aux = init_aux_params(jax.random.PRNGKey(18), "curkd", S_DIM, T_DIM)
    kd = KDSettings(distillation_type="curkd", smoothing=0.1,
                    mixup_active=False, student_prefix=1, teacher_prefix=2)
    early = [TR.np_to_torch_linear(p) for p in aux["curkd_align_early"]]
    mid = [TR.np_to_torch_linear(p) for p in aux["curkd_align_mid"]]
    last = TR.np_to_torch_linear(aux["curkd_align_last"])
    gen1 = TR.np_to_torch_conv3x3(aux["generation"]["conv1"])
    gen2 = TR.np_to_torch_conv3x3(aux["generation"]["conv2"])
    holder = torch.nn.Module()
    holder.mask_token = torch.nn.Parameter(
        torch.from_numpy(np.asarray(aux["mask_token"], np.float32)))
    aux_modules = early + mid + [last, gen1, gen2, holder]

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        epoch = EPOCH_OFFSET + s // SPE
        if epoch < 100:
            distill = TR.torch_curkd_early(s_feats, t_feats, early,
                                           [0, 1, 2], 3)
        elif epoch < 151:
            distill = TR.torch_curkd_early(s_feats, t_feats, mid,
                                           [3, 4, 5, 6], 4)
        else:  # pragma: no cover - offset keeps the run below epoch 151
            noise = torch.from_numpy(np.asarray(jax.random.uniform(
                jax.random.fold_in(jax.random.PRNGKey(99), s),
                (B, (IMG // PATCH) ** 2))))
            distill = TR.torch_curkd_last(s_feats, t_feats, last,
                                          holder.mask_token, gen1, gen2, noise)
        # zero (not None) grads for inactive phases' heads — see docstring
        zero = sum(0.0 * p.sum() for m in aux_modules
                   for p in m.parameters())
        return base + distill + zero

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k, epoch=ep)
        return loss

    torch_losses, t_all, t_ema = _run_torch(t_student, t_teacher, aux_modules,
                                            torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels,
                                 epoch_offset=EPOCH_OFFSET)
    # the loss must actually change regime at the boundary (step 20)
    assert not np.allclose(torch_losses[19], torch_losses[20], rtol=1e-3)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_wasskd_l1_dynamics_match_torch_200_steps():
    """WassKD-l1: the only objective whose gradient flows through a *sort*.
    torch.sort's backward scatters the cotangent by the returned indices;
    ours rides XLA autodiff through the bitonic compare-exchange network
    (ops/sort.py sorted_l1). For distinct values both produce the exact
    permutation gradient, so the 200-step trajectories must track — this
    pins the combine semantics (base + 5·distill, reference model/loss.py:
    242) and the 3 co-trained align heads along with the sort VJP."""
    images, labels = _data(7)
    t_student, j_student, s_params = _make_pair(False, seed=8)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=9, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(10), "wasskd", S_DIM, T_DIM)
    kd = KDSettings(distillation_type="wasskd", wasskd_type="l1",
                    smoothing=0.1, mixup_active=False,
                    student_prefix=1, teacher_prefix=2)

    aligns = [TR.np_to_torch_linear(aux["align_wasskd"][i]) for i in range(3)]

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        distill = TR.torch_wasskd_l1(s_feats, [t.detach() for t in t_feats],
                                     aligns)
        return base + 5.0 * distill

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(
        t_student, t_teacher, aligns, torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_vitkd_dynamics_match_torch_200_steps():
    """ViTKD: two linear-mimicking align heads on blocks 0/1 plus block-11
    masked generation (reference model/loss.py:251-311), all co-trained with
    the student; shared mask noise on both sides."""
    images, labels = _data(11)
    t_student, j_student, s_params = _make_pair(False, seed=12)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=13, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(14), "vitkd", S_DIM, T_DIM)
    kd = KDSettings(distillation_type="vitkd", smoothing=0.1,
                    mixup_active=False, student_prefix=1, teacher_prefix=2)

    align2 = [TR.np_to_torch_linear(aux["align2"][i]) for i in range(2)]
    align = TR.np_to_torch_linear(aux["align"])
    gen1 = TR.np_to_torch_conv3x3(aux["generation"]["conv1"])
    gen2 = TR.np_to_torch_conv3x3(aux["generation"]["conv2"])
    mask_token = torch.nn.Parameter(
        torch.from_numpy(np.asarray(aux["mask_token"], np.float32)))
    holder = torch.nn.Module()
    holder.mask_token = mask_token

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        k = jax.random.fold_in(jax.random.PRNGKey(99), s)
        noise = torch.from_numpy(
            np.asarray(jax.random.uniform(k, (B, (IMG // PATCH) ** 2))))
        distill = TR.torch_vitkd(s_feats, [t.detach() for t in t_feats],
                                 align2, align, mask_token, gen1, gen2, noise)
        return base + distill

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(
        t_student, t_teacher, align2 + [align, gen1, gen2, holder],
        torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_hard_kd_dynamics_match_torch_200_steps():
    """Hard logit KD: CE against the teacher's argmax on the dist head
    (reference model/loss.py:56-60), (1−α)·base + α·hard combine."""
    alpha = 0.5
    images, labels = _data(15)
    t_student, j_student, s_params = _make_pair(True, seed=16)
    t_teacher, j_teacher, t_params = _make_pair(False, seed=17, dim=T_DIM)
    kd = KDSettings(distillation_type="hard", alpha=alpha, smoothing=0.1,
                    mixup_active=False, student_prefix=2, teacher_prefix=1)

    def torch_loss(student, teacher, x, y, s):
        cls_logits, dist_logits, _ = student.forward_with_features(x)
        with torch.no_grad():
            t_logits = teacher(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        hard = TR.torch_hard_kd(dist_logits, t_logits)
        return (1 - alpha) * base + alpha * hard

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True,
                              distilled_training=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=out.logits_dist,
                             student_feats=None,
                             teacher_logits=t_out.logits, teacher_feats=None,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(t_student, t_teacher, [],
                                            torch_loss, images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params, {},
                                 kd, jax_loss, images, labels)
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))


def test_saliency_mgd_dynamics_match_torch_200_steps():
    """Saliency-MGD (method 1): the probe scores only influence the loss
    through argsort indices, so the probe params receive NO gradient — torch
    AdamW (p.grad is None) skips them entirely, keeping the random probe
    frozen at init for the whole run. Verifies our wd-mask exclusion does
    the same (optax would otherwise weight-decay the zero-grad params) and
    that the align/mask_token/generation co-training tracks."""
    images, labels = _data(19)
    t_student, j_student, s_params = _make_pair(False, seed=20)
    t_teacher, j_teacher, t_params = _make_pair(True, seed=21, dim=T_DIM)
    aux = init_aux_params(jax.random.PRNGKey(22), "saliency_mgd", S_DIM, T_DIM,
                          saliency_method=1)
    kd = KDSettings(distillation_type="saliency_mgd", saliency_method=1,
                    saliency_mask_ratio=0.5, smoothing=0.1,
                    mixup_active=False, student_prefix=1, teacher_prefix=2)

    align = TR.np_to_torch_linear(aux["align"])
    gen1 = TR.np_to_torch_conv3x3(aux["generation"]["conv1"])
    gen2 = TR.np_to_torch_conv3x3(aux["generation"]["conv2"])
    mask_token = torch.nn.Parameter(
        torch.from_numpy(np.asarray(aux["mask_token"], np.float32)))
    holder = torch.nn.Module()
    holder.mask_token = mask_token
    attn = TR.TorchSimpleAttention(T_DIM, 8)
    with torch.no_grad():
        lin = TR.np_to_torch_linear(aux["saliency_attn"]["qk"])
        attn.qk.weight.copy_(lin.weight)
        attn.qk.bias.copy_(lin.bias)
    probe_init = {n: p.detach().clone() for n, p in attn.named_parameters()}

    def torch_loss(student, teacher, x, y, s):
        cls_logits, _, s_feats = student.forward_with_features(x)
        with torch.no_grad():
            _, _, t_feats = teacher.forward_with_features(x)
        base = F.cross_entropy(cls_logits, y, label_smoothing=0.1)
        distill = TR.torch_saliency_mgd(
            s_feats[-1], t_feats[-1].detach(), align, mask_token, gen1, gen2,
            attn, kd.saliency_mask_ratio, 1)
        return base + distill

    def jax_loss(p, x, y, k, ep):
        out = j_student.apply({"params": p["student"]}, x, train=True)
        t_out = j_teacher.apply({"params": t_params}, x, train=False)
        loss, _ = total_loss(kd, student_logits=out.logits,
                             student_dist_logits=None,
                             student_feats=out.features,
                             teacher_logits=t_out.logits,
                             teacher_feats=t_out.features,
                             aux_params=p["aux"], targets=y, rng=k)
        return loss

    torch_losses, t_all, t_ema = _run_torch(
        t_student, t_teacher, [align, gen1, gen2, holder, attn], torch_loss,
        images, labels)
    jax_losses, state = _run_jax(j_student, j_teacher, s_params, t_params,
                                 aux, kd, jax_loss, images, labels)
    # both sides froze the gradient-less probe at its init
    for n, p in attn.named_parameters():
        np.testing.assert_array_equal(p.detach().numpy(),
                                      probe_init[n].numpy())
    np.testing.assert_array_equal(
        np.asarray(state.params["aux"]["saliency_attn"]["qk"]["kernel"]),
        np.asarray(aux["saliency_attn"]["qk"]["kernel"]))
    _assert_tracks(torch_losses, jax_losses,
                   _global_norm_torch(t_all), _global_norm_jax(state.params),
                   _global_norm_torch(t_ema), _global_norm_jax(state.ema_params))
