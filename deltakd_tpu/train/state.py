"""Train state: one pytree holding everything the jitted step mutates.

Functional replacement for the reference's scattered mutable objects
(model.parameters() + optimizer + scheduler + scaler + ModelEma,
reference tools/train.py:264-303). ``params`` holds both the student backbone
and the distillation aux heads under separate keys — they optimize jointly
exactly as the grafted modules ride along in ``student_model.parameters()``
(reference train.py:264, SURVEY.md §2.4). No loss scaler exists: bf16 on TPU
keeps fp32 range.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array                       # global optimizer step
    params: Dict[str, Any]                # {"student": ..., "aux": ...}
    opt_state: optax.OptState
    ema_params: Optional[Dict[str, Any]]  # timm ModelEma equivalent (or None)

    @classmethod
    def create(cls, *, student_params, aux_params, tx: optax.GradientTransformation,
               ema_decay: Optional[float] = None) -> "TrainState":
        params = {"student": student_params, "aux": aux_params}
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
        )

    def apply_gradients(self, *, grads, tx: optax.GradientTransformation,
                        ema_decay: Optional[float] = None) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None and ema_decay:
            # timm ModelEma: ema = decay·ema + (1−decay)·params (train.py:300-301)
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema, new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state, ema_params=new_ema)
