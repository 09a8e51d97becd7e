"""Short alias for the
``knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu``
package: ``import kdss``.

The alias replaces this module in ``sys.modules`` with the real package so
that ``kdss.<submodule>`` resolves against the real package path.
"""

import importlib
import sys

_pkg = importlib.import_module(
    "knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu"
)
sys.modules[__name__] = _pkg
