"""Device mesh construction (ICI-aware axis ordering).

Axis order is (data, fsdp, tensor) from outermost to innermost so that the
``tensor`` axis — the one with per-layer all-reduces on the critical path —
maps to physically adjacent devices on the ICI torus, while ``data``/``fsdp``
gradient reductions (once per step) ride the remaining links.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


AXIS_DATA = "data"
AXIS_FSDP = "fsdp"
AXIS_TENSOR = "tensor"
AXIS_NAMES = (AXIS_DATA, AXIS_FSDP, AXIS_TENSOR)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape.  ``data * fsdp * tensor`` must equal device count.

    Defaults cover the single-chip dev/bench case; v5e-8 KD runs typically
    use ``(1, 1, 8)`` (teacher TP over all chips, student replicated) or
    ``(1, 2, 4)``.
    """

    data: int = 1
    fsdp: int = 1
    tensor: int = 1

    @property
    def shape(self) -> Tuple[int, int, int]:
        return (self.data, self.fsdp, self.tensor)

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.tensor

    @staticmethod
    def for_devices(n: int, tensor: Optional[int] = None) -> "MeshConfig":
        """Reasonable default layout for ``n`` devices.

        Puts everything on ``tensor`` (the 7B teacher must shard to fit
        16GB/chip on v5e) unless an explicit split is given.
        """
        if tensor is None:
            tensor = n
        assert n % tensor == 0, (n, tensor)
        rest = n // tensor
        # Favor fsdp over pure data for the leftover axis: it also shards
        # the student optimizer state.
        return MeshConfig(data=1, fsdp=rest, tensor=tensor)


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """Build the mesh.  ``devices`` defaults to all local devices.

    Uses ``jax.experimental.mesh_utils`` when the topology is a real TPU
    slice (respects ICI adjacency); falls back to a reshape on CPU/host
    platforms.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if cfg.num_devices != n:
        raise ValueError(
            f"mesh shape {cfg.shape} needs {cfg.num_devices} devices, have {n}"
        )
    if devices[0].platform == "tpu":
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(cfg.shape, devices=devices)
    else:
        dev_array = np.asarray(devices).reshape(cfg.shape)
    return Mesh(dev_array, AXIS_NAMES)


def active_abstract_mesh():
    """The mesh set via ``jax.set_mesh`` (abstract form), or None.

    Single probe shared by the shard_map wrappers (ops/flash_attention.py,
    ops/fused_spmd.py) so a JAX API change is fixed in one place."""
    try:
        m = jax.sharding.get_abstract_mesh()
        if m is not None and m.shape_tuple:
            return m
    except Exception:
        pass
    return None
