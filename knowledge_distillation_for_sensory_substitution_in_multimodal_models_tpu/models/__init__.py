"""Flax model definitions: SigLIP vision tower, Qwen2 decoder LM, and the
LLaVA-OneVision multimodal wrapper (student 0.5B / teacher 7B), plus the
HF->Flax weight converter."""

from .siglip import SigLIPVisionTower
from .qwen2 import Qwen2LM
from .llava_onevision import LlavaOnevision
from .panesar import PanesarVQAModel

__all__ = ["SigLIPVisionTower", "Qwen2LM", "LlavaOnevision", "PanesarVQAModel"]
