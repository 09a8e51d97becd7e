"""Pure-function distillation losses (jit/grad friendly).

Replaces the methods of the reference Lightning modules
(`distillation/knowledge_distillation7b_*/OnlineKnowledgeDistillationLLavaOneVision.py`)
with stateless jnp functions so they can be fused into one pjit train step.
"""

from .chunked import chunked_kd_terms
from .kd_losses import (
    masked_ntxent_loss,
    masked_cross_entropy,
    truncate_teacher_logits,
    kd_kl_loss,
    loca_loss,
    loca_calibrated_probs,
    ntxent_loss,
    ofa_loss,
    pool_and_normalize,
    feature_mse_loss,
    vision_phase1_loss,
)

__all__ = [
    "chunked_kd_terms",
    "masked_ntxent_loss",
    "masked_cross_entropy",
    "truncate_teacher_logits",
    "kd_kl_loss",
    "loca_loss",
    "loca_calibrated_probs",
    "ntxent_loss",
    "ofa_loss",
    "pool_and_normalize",
    "feature_mse_loss",
    "vision_phase1_loss",
]
