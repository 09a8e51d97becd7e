"""GSPMD partition rules for LLaVA-OneVision parameter trees.

Replaces the reference's HF-accelerate ``device_map="auto"`` layer placement
(`logit_based/OnlineKnowledgeDistillationLLavaOneVision.py:29-33,55-59`) with
compiled sharding: every weight gets a ``PartitionSpec`` over the
(data, fsdp, tensor) mesh and XLA inserts the all-gathers/reduce-scatters.

Scheme (Megatron-style TP + ZeRO-style fsdp on the complementary dim):

==============================  =======================  ====================
weight                          shape                    spec
==============================  =======================  ====================
embed_tokens.embedding          [V, D]                   (fsdp, tensor)
attn q/k/v kernel               [D, H*hd]                (fsdp, tensor)
attn q/k/v bias                 [H*hd]                   (tensor,)
attn o/out kernel               [H*hd, D]                (tensor, fsdp)
mlp up/gate/fc1 kernel          [D, I]                   (fsdp, tensor)
mlp down/fc2 kernel             [I, D]                   (tensor, fsdp)
lm_head kernel                  [D, V]                   (fsdp, tensor)
patch_embedding kernel          [kh, kw, C, D]           (None,None,None,tensor)
projector linear_1              [Dv, Dt]                 (fsdp, tensor)
projector linear_2              [Dt, Dt]                 (tensor, fsdp)
norm scales/biases, newline     [D] / [T, D]             replicated
==============================  =======================  ====================

A dimension is only sharded when its size divides the mesh axis size —
otherwise that dim falls back to replicated (keeps the same rules valid for
the 0.5B student, whose kv-proj is tiny, and the 7B teacher).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_FSDP, AXIS_TENSOR


def _rule_for_path(path: Tuple[str, ...]) -> Tuple:
    """Logical spec for a param path (tuple of str keys, leaf name last)."""
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""

    # --- norms / small vectors: replicated ---
    if name in ("scale", "weight") and (
        "layernorm" in parent or "layer_norm" in parent or parent in ("norm", "post_layernorm")
    ):
        return ()
    if name == "embedding":
        # V over fsdp, D over tensor — NOT (tensor, fsdp): the token-lookup
        # gather emits D-sharded activations, and resharding them to the
        # batch-sharded layout is only efficient when the source and target
        # axis sets are disjoint (all-gather over tensor + slice over
        # data/fsdp).  With D sharded over fsdp the partitioner hits the
        # "involuntary full rematerialization" path (replicate-then-
        # repartition of every [B,S,D] embed output and its cotangent).
        return (AXIS_FSDP, AXIS_TENSOR)
    if name == "image_newline" or name == "position_embedding":
        return ()

    if name == "kernel":
        if parent in ("q_proj", "k_proj", "v_proj"):
            return (AXIS_FSDP, AXIS_TENSOR)
        if parent in ("o_proj", "out_proj"):
            return (AXIS_TENSOR, AXIS_FSDP)
        if parent in ("gate_proj", "up_proj", "fc1", "linear_1"):
            return (AXIS_FSDP, AXIS_TENSOR)
        if parent in ("down_proj", "fc2", "linear_2"):
            return (AXIS_TENSOR, AXIS_FSDP)
        if parent == "lm_head":
            return (AXIS_FSDP, AXIS_TENSOR)
        if parent == "patch_embedding":
            return (None, None, None, AXIS_TENSOR)
        return ()

    if name == "bias":
        if parent in ("q_proj", "k_proj", "v_proj", "fc1", "linear_1"):
            return (AXIS_TENSOR,)
        return ()

    # int8 frozen-teacher weights (ops/int8.py): kernel_q shards exactly
    # like kernel; kernel_scale [out] follows the kernel's output dim.
    if name == "kernel_q":
        if parent in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                      "fc1"):
            return (AXIS_FSDP, AXIS_TENSOR)
        if parent in ("o_proj", "down_proj", "out_proj", "fc2"):
            return (AXIS_TENSOR, AXIS_FSDP)
        if parent == "lm_head":
            # stored VOCAB-MAJOR [Vt, Dt] since r5 (ops/int8.py): the
            # vocab axis (dim 0) shards over tensor, matching the
            # per-vocab kernel_scale's (TENSOR,) below
            return (AXIS_TENSOR, AXIS_FSDP)
        return ()
    if name == "kernel_scale":
        if parent in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
                      "fc1"):
            return (AXIS_TENSOR,)
        if parent in ("o_proj", "down_proj", "out_proj", "fc2"):
            return (AXIS_FSDP,)
        if parent == "lm_head":
            return (AXIS_TENSOR,)
        return ()
    # int8 token embedding (QEmbed): same layout rationale as "embedding"
    # above; the per-row scale column follows the vocab axis.
    if name == "embedding_q":
        return (AXIS_FSDP, AXIS_TENSOR)
    if name == "embedding_scale":
        return (AXIS_FSDP, None)

    return ()


def _fit(spec: Tuple, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """Pad the spec to the leaf rank; drop axes whose size doesn't divide."""
    out = []
    for d in range(len(shape)):
        ax = spec[d] if d < len(spec) else None
        if ax is not None and shape[d] % mesh.shape[ax] != 0:
            ax = None
        out.append(ax)
    # Trailing Nones are implicit; keep explicit for clarity.
    return P(*out)


def param_partition_specs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """PartitionSpec pytree matching ``params``' structure."""
    flat = traverse_util.flatten_dict(params, keep_empty_nodes=False)
    specs = {
        path: _fit(_rule_for_path(path), leaf.shape, mesh)
        for path, leaf in flat.items()
    }
    return traverse_util.unflatten_dict(specs)


def logical_to_sharding(spec_tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host param tree onto the mesh under the partition rules."""
    specs = param_partition_specs(params, mesh)
    shardings = logical_to_sharding(specs, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def constrain(x, *spec):
    """``with_sharding_constraint`` that no-ops outside a mesh context.

    Model code calls this at activation boundaries (post-embed, post-merge,
    per-layer outputs) to anchor GSPMD propagation; under single-device jit
    or eager it is the identity, so the same model serves both paths.
    """
    import jax

    try:
        abstract_mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # pre-set_mesh JAX versions only
        return x
    if abstract_mesh is None or not abstract_mesh.shape_tuple:
        return x
    if any(
        ax is not None and ax not in abstract_mesh.axis_names
        for s in spec
        for ax in ((s,) if (s is None or isinstance(s, str)) else s)
    ):
        return x
    # Drop axes that do not divide the dimension (e.g. a size-1 batch
    # over data*fsdp in tiny configs): GSPMD would otherwise pad and
    # "involuntarily fully rematerialize" on the transpose pass.
    sizes = dict(abstract_mesh.shape_tuple)

    def _fit(dim_size, s):
        axes = (s,) if isinstance(s, str) else tuple(s or ())
        prod = 1
        kept = []
        for ax in axes:
            if dim_size % (prod * sizes[ax]) == 0:
                kept.append(ax)
                prod *= sizes[ax]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else tuple(kept)

    spec = tuple(
        None if s is None else _fit(d, s)
        for d, s in zip(x.shape, spec)
    )
    return jax.lax.with_sharding_constraint(x, P(*spec))


def batch_sharding(mesh: Mesh, accum: bool = False) -> NamedSharding:
    """Batch-axis sharding over data x fsdp (standard ZeRO data layout).

    With ``accum=True`` the leading axis is the gradient-accumulation axis
    (scanned over *in time*, never sharded); the batch axis is axis 1.
    """
    if accum:
        return NamedSharding(mesh, P(None, (AXIS_DATA, AXIS_FSDP)))
    return NamedSharding(mesh, P((AXIS_DATA, AXIS_FSDP)))


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, accum: bool = True
) -> Dict[str, Any]:
    """Device-put a host batch, sharding the batch axis over (data, fsdp)."""
    s = batch_sharding(mesh, accum)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
