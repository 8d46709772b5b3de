"""Probe: does wasskd-l1 trajectory parity hold at the EQUIVALENCE-harness
shapes (img64/patch8 -> 64 tokens, student dim64 depth4 plain, teacher dim128
depth6 distilled)? The dynamics test proves parity at 4 tokens; the harness
run is stuck at chance while torch learns — this isolates whether the loss/
grad machinery itself diverges at the bigger sort size, or whether the gap
lives in the harness-level training loop (augmentation/mixup/schedule)."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
import torch.nn.functional as F

import test_dynamics as TD
from tests import torch_ref as TR

# re-point the dynamics machinery at the harness shapes
TD.IMG, TD.PATCH = 64, 8
TD.S_DIM, TD.T_DIM, TD.HEADS = 64, 128, 4
TD.C = 8
TD.STEPS = int(os.environ.get("STEPS", "200"))

from deltakd_tpu.kd import KDSettings, init_aux_params
from deltakd_tpu.kd.losses import total_loss


def main():
    images, labels = TD._data(7)
    t_student, j_student, s_params = TD._make_pair(False, seed=8,
                                                   dim=TD.S_DIM, depth=4)
    t_teacher, j_teacher, t_params = TD._make_pair(True, seed=9,
                                                   dim=TD.T_DIM, depth=6)
    aux = init_aux_params(jax.random.PRNGKey(10), "wasskd", TD.S_DIM, TD.T_DIM)
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

    torch_losses, t_all, t_ema = TD._run_torch(
        t_student, t_teacher, aligns, torch_loss, images, labels)
    jax_losses, state = TD._run_jax(j_student, j_teacher, s_params, t_params,
                                    aux, kd, jax_loss, images, labels)
    rel = np.abs(torch_losses - jax_losses) / (np.abs(torch_losses) + 1e-6)
    print("torch first/last:", torch_losses[:3], torch_losses[-3:])
    print("jax   first/last:", jax_losses[:3], jax_losses[-3:])
    print(f"max rel {rel.max():.3e}  mean rel {rel.mean():.3e}")
    print("param norms:", TD._global_norm_torch(t_all),
          TD._global_norm_jax(state.params))


if __name__ == "__main__":
    main()
