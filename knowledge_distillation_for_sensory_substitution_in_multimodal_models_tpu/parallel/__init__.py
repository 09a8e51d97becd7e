"""Parallelism layer: device mesh construction and GSPMD sharding rules.

This is net-new machinery relative to the reference, which trains on a single
GPU (``devices=1``) and places the 7B teacher with HF accelerate's
``device_map="auto"`` (`knowledge_distillation7b_logit_based/
OnlineKnowledgeDistillationLLavaOneVision.py:29-33,55-59`).  On TPU the
equivalents are compiled: a ``jax.sharding.Mesh`` over ICI with

* ``data``   — pure data parallelism (batch axis),
* ``fsdp``   — ZeRO-style parameter/optimizer sharding for the student
  (the reference's commented-out FSDP sketch,
  `train_online_kd.py:152-159`, made real),
* ``tensor`` — Megatron-style tensor parallelism for the frozen 7B teacher
  (the ``device_map="auto"`` replacement; XLA emits the collectives).
"""

from .mesh import MeshConfig, make_mesh
from .sharding import (
    batch_sharding,
    logical_to_sharding,
    param_partition_specs,
    shard_params,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "batch_sharding",
    "logical_to_sharding",
    "param_partition_specs",
    "shard_params",
]
