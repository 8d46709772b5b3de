"""Test-only PyTorch reference implementations.

The upstream reference depends on timm/geomloss (not installed here), so these
minimal torch modules reproduce the exact timm DeiT architecture / state_dict
naming and the reference loss formulas (reference model/loss.py, model/misc.py)
for golden-value comparison. Deterministic: all randomness is passed in
explicitly. Never imported by the framework itself.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch=16, in_chans=3):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, dim, patch, patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchViT(nn.Module):
    """timm-compatible DeiT (state_dict names match timm VisionTransformer)."""

    def __init__(self, img_size=224, patch=16, dim=192, depth=12, num_heads=3,
                 num_classes=100, distilled=False):
        super().__init__()
        self.distilled = distilled
        num_patches = (img_size // patch) ** 2
        prefix = 2 if distilled else 1
        self.patch_embed = PatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        if distilled:
            self.dist_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, prefix + num_patches, dim) * 0.02)
        self.blocks = nn.ModuleList(Block(dim, num_heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)
        if distilled:
            self.head_dist = nn.Linear(dim, num_classes)

    def forward_with_features(self, x):
        B = x.shape[0]
        x = self.patch_embed(x)
        toks = [self.cls_token.expand(B, -1, -1)]
        if self.distilled:
            toks.append(self.dist_token.expand(B, -1, -1))
        x = torch.cat(toks + [x], dim=1) + self.pos_embed
        feats = []
        for blk in self.blocks:
            y = blk.attn(blk.norm1(x))
            x = x + y
            mlp_out = blk.mlp(blk.norm2(x))
            feats.append(mlp_out)
            x = x + mlp_out
        x = self.norm(x)
        cls_logits = self.head(x[:, 0])
        if self.distilled:
            dist_logits = self.head_dist(x[:, 1])
            return cls_logits, dist_logits, feats
        return cls_logits, None, feats

    def forward(self, x):
        cls_logits, dist_logits, _ = self.forward_with_features(x)
        if self.distilled:
            return (cls_logits + dist_logits) / 2
        return cls_logits


# -----------------------------------------------------------------------------
# Reference loss formulas (deterministic: noise passed in)
# -----------------------------------------------------------------------------

def torch_random_masking(x, mask_ratio, noise):
    """reference model/misc.py:5-32 with explicit noise."""
    N, L, D = x.shape
    len_keep = int(L * (1 - mask_ratio))
    ids_shuffle = torch.argsort(noise, dim=1)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_keep = torch.gather(x, 1, ids_keep.unsqueeze(-1).repeat(1, 1, D))
    mask = torch.ones([N, L])
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    return x_keep, mask, ids_restore, ids_shuffle[:, len_keep:]


def masked_generation(x_keep, ids_restore, mask_token, gen_conv1, gen_conv2):
    """fill + restore + 14x14 grid + conv/relu/conv (reference loss.py:300-307)."""
    B, L = ids_restore.shape
    D = x_keep.shape[-1]
    mask_tokens = mask_token.repeat(B, L - x_keep.shape[1], 1)
    x_ = torch.cat([x_keep, mask_tokens], dim=1)
    x = torch.gather(x_, 1, ids_restore.unsqueeze(-1).repeat(1, 1, D))
    hw = int(L ** 0.5)
    x = x.reshape(B, hw, hw, D).permute(0, 3, 1, 2)
    x = gen_conv2(F.relu(gen_conv1(x)))
    return x.flatten(2).transpose(1, 2)


def torch_soft_kd(outputs_kd, teacher_logits, tau):
    T = tau
    return F.kl_div(
        F.log_softmax(outputs_kd / T, dim=1),
        F.log_softmax(teacher_logits / T, dim=1),
        reduction="sum", log_target=True) * (T * T) / outputs_kd.numel()


def torch_hard_kd(outputs_kd, teacher_logits):
    return F.cross_entropy(outputs_kd, teacher_logits.argmax(dim=1))


def torch_vitkd(s_feats, t_feats, align2, align, mask_token, gen1, gen2, noise,
                alpha=3e-5, beta=3e-6, lam=0.5):
    """reference model/loss.py:251-311."""
    b0s, b1s, b11s = s_feats[0][:, 1:], s_feats[1][:, 1:], s_feats[-1][:, 1:]
    b0t, b1t, b11t = t_feats[0][:, 2:], t_feats[1][:, 2:], t_feats[-1][:, 2:]
    B = b0s.shape[0]
    mse = nn.MSELoss(reduction="sum")
    xc = torch.stack([align2[0](b0s), align2[1](b1s)], dim=1)
    low_t = torch.stack([b0t, b1t], dim=1)
    loss_lr = mse(xc, low_t) / B * alpha
    x = align(b11s)
    x_keep, mask, ids_restore, _ = torch_random_masking(x, lam, noise)
    x = masked_generation(x_keep, ids_restore, mask_token, gen1, gen2)
    loss_gen = mse(x * mask.unsqueeze(-1), b11t * mask.unsqueeze(-1)) / B * beta / lam
    return loss_lr + loss_gen


def torch_lrkd(t_feats, s_feats_aligned, rank, alpha, beta, gamma,
               sign_align=True):
    """reference model/loss.py:314-330 (full SVD). ``sign_align`` resolves the
    SVD column-sign ambiguity against the deterministic Gram-eigh convention
    (V columns flipped so the largest-|.| entry is positive)."""
    mse = nn.MSELoss(reduction="mean")
    losses = []
    for t, s in zip(t_feats, s_feats_aligned):
        t2 = t.reshape(-1, t.size(-1))
        s2 = s.reshape(-1, s.size(-1))
        U, S, Vh = torch.linalg.svd(t2, full_matrices=False)
        target = U[:, :rank] @ torch.diag(S[:rank])
        losses.append((mse, target, s2))
    return losses


def torch_curkd_early(s_feats, t_feats, aligns, epoch_phase_layers, denom):
    mse = nn.MSELoss(reduction="sum")
    B = s_feats[0].shape[0]
    loss = 0.0
    for j, i in enumerate(epoch_phase_layers):
        loss = loss + mse(aligns[j](s_feats[i][:, 1:]), t_feats[i][:, 2:])
    return loss / denom / B * 4e-5


def torch_mgd(s_last, t_last, align, mask_token, gen1, gen2, noise, mask_ratio,
              mgd_alpha):
    """reference model/loss.py:422-452."""
    mse = nn.MSELoss(reduction="mean")
    s = align(s_last[:, 1:])
    t = t_last[:, 2:]
    x_keep, mask, ids_restore, _ = torch_random_masking(s, mask_ratio, noise)
    x = masked_generation(x_keep, ids_restore, mask_token, gen1, gen2)
    mask = mask.unsqueeze(-1)
    return mse(x * mask, t * mask) * mgd_alpha


def torch_wasskd_l1(s_feats, t_feats, aligns):
    """reference model/loss.py:187-199."""
    loss = 0.0
    for i in range(3):
        s = aligns[i](s_feats[i][:, 1:])
        t = t_feats[i][:, 2:]
        s_sorted, _ = torch.sort(s, dim=1)
        t_sorted, _ = torch.sort(t, dim=1)
        loss = loss + torch.mean(torch.abs(s_sorted - t_sorted))
    return loss / 3.0


def torch_diffkd(s_feats, t_feats, aligns, denoise_time1, denoise_time2,
                 denoise_net1, denoise_net2, t_step, noises):
    """reference model/loss.py:105-155 with explicit timesteps/noise and
    dropout disabled (eval parity)."""
    T = 8
    sigma_max = torch.where(t_step < T // 2, torch.tensor(0.3), torch.tensor(0.7))
    sigma_t = (1 - torch.cos(math.pi * t_step.float() / T)) * sigma_max
    feat_loss = 0.0
    for (s, t, align, eps) in zip(s_feats, t_feats, aligns, noises):
        t_n = t / torch.norm(t, p=2, dim=-1, keepdim=True)
        s_n = align(s) / torch.norm(align(s), p=2, dim=-1, keepdim=True)
        noise = eps * sigma_t.view(-1, 1, 1)
        noisy = t_n + noise
        t_emb = denoise_time2(F.gelu(denoise_time1(t_step.float().view(-1, 1))))
        h = noisy + t_emb.unsqueeze(1)
        pred = denoise_net2(F.gelu(denoise_net1(h)))
        feat_loss = feat_loss + F.mse_loss(pred, noise)
        w_t = 1 / (sigma_t ** 2 + 1e-8)
        feat_loss = feat_loss + w_t.mean() * F.mse_loss(s_n, t_n)
    return feat_loss / 3 * 5e-5


def np_to_torch_linear(p):
    """Our functional dense params {kernel [in,out], bias [out]} → nn.Linear."""
    kernel = np.asarray(p["kernel"], dtype=np.float32)
    bias = np.asarray(p["bias"], dtype=np.float32)
    lin = nn.Linear(kernel.shape[0], kernel.shape[1])
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(kernel.T))
        lin.bias.copy_(torch.from_numpy(bias))
    return lin


def np_to_torch_conv3x3(p):
    """Our conv params {kernel [3,3,C,C] HWIO, bias} → nn.Conv2d(C,C,3,pad=1)."""
    kernel = np.asarray(p["kernel"], dtype=np.float32)
    bias = np.asarray(p["bias"], dtype=np.float32)
    conv = nn.Conv2d(kernel.shape[2], kernel.shape[3], 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(bias))
    return conv


class TorchSimpleAttention(nn.Module):
    """reference model/models.py:38-56."""

    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qk = nn.Linear(dim, dim * 2, bias=True)

    def forward(self, x):
        B, N, C = x.shape
        qk = self.qk(x).reshape(B, N, 2, self.num_heads, C // self.num_heads)
        qk = qk.permute(2, 0, 3, 1, 4)
        q, k = qk[0], qk[1]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        return attn.mean(dim=1).diagonal(dim1=-2, dim2=-1)


class TorchSimpleCrossAttention(nn.Module):
    """reference model/models.py:14-35."""

    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=True)
        self.k = nn.Linear(dim, dim, bias=True)

    def forward(self, xq, xk):
        B, Nq, C = xq.shape
        Nk = xk.shape[1]
        q = self.q(xq).reshape(B, Nq, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        k = self.k(xk).reshape(B, Nk, self.num_heads, C // self.num_heads).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        return attn.softmax(dim=-1).mean(dim=1)


def torch_saliency_masking(attn_module, teacher_feat, student_feat, mask_ratio,
                           method):
    """reference model/misc.py:38-165."""
    if method == 1:
        tf = teacher_feat[:, 2:]
        N, L, D = tf.shape
        len_keep = int(L * (1 - mask_ratio))
        scores = attn_module(tf)
    elif method == 2:
        tf = torch.cat([teacher_feat[:, :1], teacher_feat[:, 2:]], dim=1)
        B, L, D = tf.shape
        L_patch = L - 1
        len_keep = int(L_patch * (1 - mask_ratio))
        num_heads = attn_module.num_heads
        head_dim = D // num_heads
        scale = head_dim ** -0.5
        qk = attn_module.qk(tf)
        q, k = torch.chunk(qk, 2, dim=-1)
        q = q.reshape(B, L, num_heads, head_dim).permute(0, 2, 1, 3)
        k = k.reshape(B, L, num_heads, head_dim).permute(0, 2, 1, 3)
        q_cls = q[:, :, 0:1, :]
        attn = ((q_cls @ k.transpose(-2, -1)) * scale).softmax(dim=-1)
        scores = attn.mean(dim=1).squeeze(1)[:, 1:]
    elif method == 3:
        tf = torch.cat([teacher_feat[:, :1], teacher_feat[:, 2:]], dim=1)
        cls_tok, patches = tf[:, :1], tf[:, 1:]
        len_keep = int(patches.shape[1] * (1 - mask_ratio))
        scores = attn_module(cls_tok, patches)
        if scores.dim() == 3 and scores.size(1) == 1:
            scores = scores.squeeze(1)
    B, L = scores.shape
    D = student_feat.shape[-1]
    ids_shuffle = torch.argsort(scores, dim=1)
    ids_restore = torch.argsort(ids_shuffle, dim=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_keep = torch.gather(student_feat, 1, ids_keep.unsqueeze(-1).expand(-1, -1, D))
    mask = torch.ones([B, L])
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    return x_keep, mask, ids_restore


def torch_saliency_mgd(s_last, t_last, align, mask_token, gen1, gen2,
                       attn_module, mask_ratio, method):
    """reference model/loss.py:335-360."""
    mse = nn.MSELoss(reduction="mean")
    s = align(s_last[:, 1:])
    x_keep, mask, ids_restore = torch_saliency_masking(
        attn_module, t_last, s, mask_ratio, method)
    x = masked_generation(x_keep, ids_restore, mask_token, gen1, gen2)
    t = t_last[:, 2:]
    return mse(x * mask.unsqueeze(-1), t * mask.unsqueeze(-1)) * 4


def torch_curkd_last(s_feats, t_feats, align_last, mask_token, gen1, gen2, noise):
    """reference model/loss.py:394-420."""
    mse = nn.MSELoss(reduction="sum")
    stu = align_last(s_feats[11][:, 1:])
    tea = t_feats[11][:, 2:]
    B, N, D = stu.shape
    x_keep, mask, ids_restore, _ = torch_random_masking(stu, 0.5, noise)
    x = masked_generation(x_keep, ids_restore, mask_token, gen1, gen2)
    return mse(x * mask.unsqueeze(-1), tea * mask.unsqueeze(-1)) / B * 5e-5
