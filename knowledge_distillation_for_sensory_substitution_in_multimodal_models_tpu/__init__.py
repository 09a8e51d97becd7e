"""TPU-native knowledge-distillation framework for sensory substitution in
multimodal models (RGB -> depth LLaVA-OneVision distillation).

A ground-up JAX/Flax/pjit/Pallas rebuild of the capabilities of the reference
PyTorch-Lightning codebase
``shayekh00/Knowledge_Distillation_for_Sensory_Substitution_in_Multimodal_Models``:

* dual-stream (RGB teacher / depth student) SUNRGBD VQA data pipeline with
  Prewitt depth->3ch encoding,
* Flax LLaVA-OneVision (SigLIP-SO400M vision tower + Qwen2 LM) for the
  0.5B student and frozen 7B teacher,
* the three distillation strategies (logit-based LoCa, feature-based
  vision contrastive, 3-phase "double trouble" hybrid) as pure-jax losses
  fused into a single pjit train step,
* GSPMD sharding of the frozen teacher over a ``jax.sharding.Mesh``,
* jit-compiled greedy decoding with repetition penalty / no-repeat-ngram,
* evaluation metrics and CLI entry points with reference flag parity.

Import as ``import knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu as kdss``
(the short alias ``kdss`` is also registered).
"""

import sys as _sys

__version__ = "0.1.0"

# Short import alias: `import kdss` resolves to this package.
_sys.modules.setdefault("kdss", _sys.modules[__name__])
