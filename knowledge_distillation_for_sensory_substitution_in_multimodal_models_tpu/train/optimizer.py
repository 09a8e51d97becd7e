"""Optimizer, LR schedule, and phase-freeze masks.

Reference semantics being matched:

* ``torch.optim.AdamW(student.parameters(), lr=1e-5)`` +
  ``CosineAnnealingLR(T_max=10)`` stepped once per *epoch*
  (`logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:279-282`);
  baselines use lr 2e-5 without a scheduler
  (`distillation/LLavaOneVisionModule.py:162-163`).
* The double-trouble phase schedule mutates ``requires_grad``
  (phase1 freezes the student LM, phase2 the vision tower, phase3 nothing —
  `phase1/train_online_kd.py:105-116`, `phase2/...:106-112`,
  `phase3/...:108-116`).  Here freezing is a *static mask*: frozen params
  get ``optax.set_to_zero`` updates, so one compiled step serves any phase
  and the mask participates in jit caching instead of graph surgery.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import optax
from flax import traverse_util


def cosine_annealing_schedule(
    base_lr: float, t_max: int, steps_per_epoch: int
) -> optax.Schedule:
    """torch ``CosineAnnealingLR`` (eta_min=0) stepped per epoch.

    lr(step) = base * (1 + cos(pi * epoch / T_max)) / 2,
    epoch = step // steps_per_epoch (Lightning steps the scheduler on epoch
    boundaries).  Epochs beyond T_max continue the cosine (torch behavior
    is periodic; runs here never exceed T_max epochs, matching the
    reference's max_epochs <= 10 usage).
    """

    def schedule(step):
        import jax.numpy as jnp

        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (1.0 + jnp.cos(math.pi * epoch / t_max)) / 2.0

    return schedule


def phase_trainable_mask(params: Dict[str, Any], kd_mode: str, phase: int):
    """Boolean pytree: True = trainable under the given mode/phase.

    double_trouble phase1 freezes every ``language_model.*`` param,
    phase2 every ``vision_tower.*`` param, phase3 trains all; other modes
    train all student params (teacher params never enter the train state).
    """
    flat = traverse_util.flatten_dict(params, keep_empty_nodes=False)

    def trainable(path) -> bool:
        if kd_mode != "double_trouble":
            return True
        root = path[0]
        if phase == 1:
            return root != "language_model"
        if phase == 2:
            return root != "vision_tower"
        return True

    mask = {path: trainable(path) for path in flat}
    return traverse_util.unflatten_dict(mask)


def make_optimizer(
    params: Dict[str, Any],
    learning_rate: float,
    *,
    weight_decay: float = 0.01,
    cosine_t_max: int = 0,
    steps_per_epoch: int = 1,
    kd_mode: str = "baseline",
    phase: int = 0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
) -> optax.GradientTransformation:
    """AdamW (torch defaults) with optional cosine annealing + freeze mask.

    ``mu_dtype="bfloat16"`` forces Adam's first moment to bf16.  NOTE:
    optax's default (``None``) already stores mu/nu in the PARAM dtype,
    so with bf16 params this flag is a measured no-op (byte-identical
    HBM footprint, r5 accum-fit arms — docs/PERF_NOTES.md); it only
    shrinks state for f32-param configs.
    """
    if cosine_t_max > 0:
        lr = cosine_annealing_schedule(learning_rate, cosine_t_max, steps_per_epoch)
    else:
        lr = learning_rate
    tx = optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                     mu_dtype=mu_dtype)
    mask = phase_trainable_mask(params, kd_mode, phase)
    if not all(jax.tree.leaves(mask)):
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", mask),
        )
    return tx
