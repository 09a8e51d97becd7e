"""Training machinery: one pjit-compiled step (teacher fwd + student
fwd/bwd + fused KD losses), optax AdamW + cosine annealing, gradient
accumulation via ``lax.scan``, phase freeze masks, Orbax checkpointing.

Replaces the reference's PyTorch-Lightning Trainer + per-config
LightningModules (`distillation/*/train_online_kd.py`,
`.../OnlineKnowledgeDistillationLLavaOneVision.py`).
"""

from .optimizer import (
    cosine_annealing_schedule,
    make_optimizer,
    phase_trainable_mask,
)
from .step import KDModels, make_eval_step, make_train_step

__all__ = [
    "cosine_annealing_schedule",
    "make_optimizer",
    "phase_trainable_mask",
    "KDModels",
    "make_train_step",
    "make_eval_step",
]
