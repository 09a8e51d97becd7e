"""AOT compilation of the sharded KD train step at real model scale.

The reference's product configuration loads the real 7B teacher
(`distillation/knowledge_distillation7b_logit_based/
OnlineKnowledgeDistillationLLavaOneVision.py:29-33` and
`phase1/OnlineKnowledgeDistillationLLavaOneVision.py:43-48`).  Multi-chip
hardware is not available in this environment, so the structural proof that
the framework's partition rules actually work at 7B dimensions is an
*ahead-of-time* compile: abstract parameters (``jax.eval_shape`` — no
weights materialized), production shardings attached to every leaf of the
train state, ``jit(step).lower(...).compile()`` on an 8-device mesh, and
``compiled.memory_analysis()`` as the per-chip HBM budget.

This catches the failure classes that toy-dim tests cannot: non-dividing
dimensions (152128-vocab / 3584-hidden / 4-kv-head over tensor=4),
resharding pathologies between rule boundaries, and HBM blow-ups from
materialized intermediates.

The same machinery compiles depth-reduced width-exact variants (real
hidden/vocab/head dims, 2 layers) for CI, where a full-depth CPU compile
is too slow for the suite; ``scripts/aot_7b.py`` runs the full-depth
program and records the HBM table in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..configs import (
    LlavaOnevisionConfig,
    TrainConfig,
    kd_loss_config_for,
    llava_onevision_0_5b,
    llava_onevision_7b,
)
from .mesh import MeshConfig, make_mesh
from .sharding import batch_sharding, param_partition_specs


def depth_reduced(cfg: LlavaOnevisionConfig, layers: int = 2) -> LlavaOnevisionConfig:
    """Width-exact, depth-reduced variant: real hidden/vocab/head/mlp dims,
    ``layers`` decoder + vision layers.  Validates the same partition
    arithmetic as the full model at a fraction of the (CPU) compile time."""
    return dataclasses.replace(
        cfg,
        text=dataclasses.replace(cfg.text, num_hidden_layers=layers),
        vision=dataclasses.replace(cfg.vision, num_hidden_layers=layers),
    )


def _suffix_spec_tree(abstract_tree, param_specs_flat: Dict[Tuple[str, ...], P]):
    """PartitionSpec tree for an arbitrary state pytree.

    Optimizer states (optax adam mu/nu, masked wrappers) mirror the params
    dict structure, so each leaf's dict-key path suffix is matched against
    the known param paths; scalars and unmatched leaves are replicated.
    """

    def leaf_spec(path, leaf):
        keys = tuple(
            k.key for k in path if isinstance(k, jax.tree_util.DictKey)
        )
        for start in range(len(keys)):
            if keys[start:] in param_specs_flat:
                return param_specs_flat[keys[start:]]
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, abstract_tree)


def _with_shardings(abstract_tree, spec_tree, mesh):
    return jax.tree.map(
        lambda sds, spec: jax.ShapeDtypeStruct(
            sds.shape, sds.dtype, sharding=NamedSharding(mesh, spec)
        ),
        abstract_tree,
        spec_tree,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
    )


def _flat_param_specs(params_abstract, mesh) -> Dict[Tuple[str, ...], P]:
    from flax import traverse_util

    specs = param_partition_specs(params_abstract, mesh)
    return dict(traverse_util.flatten_dict(specs, keep_empty_nodes=False))


def build_kd_step_for_aot(
    scfg: LlavaOnevisionConfig,
    tcfg: LlavaOnevisionConfig,
    mesh_cfg: MeshConfig,
    *,
    seq_len: int = 3072,
    per_dp_batch: int = 1,
    accum: int = 2,
    orig: Tuple[int, int] = (530, 730),
    teacher_quant: str = "none",
    teacher_embed_quant: str = "none",
    param_dtype=jnp.bfloat16,
    attn_impl: str = "xla_chunked",
    fused_local_impl: str = "xla",
    phase: int = 3,
    loss_chunk_size: int = 128,
    donate_state: bool = True,
    mesh=None,
):
    """Build the jitted phase-``phase`` KD step + fully-sharded abstract args.

    Returns ``(jitted_step, (abstract_state, abstract_tparams,
    abstract_batch), mesh)`` — nothing is materialized; call
    ``.lower(*args).compile()`` inside ``jax.set_mesh(mesh)``.

    ``attn_impl="xla_chunked"`` gives the flash kernel's O(chunk*Skv)
    memory behavior in stock XLA so CPU-backend compiles see a
    production-like activation profile (Pallas does not lower on CPU);
    on real TPUs pass ``attn_impl="pallas"``/``fused_local_impl="pallas"``.
    """
    from flax.training.train_state import TrainState

    from ..models import LlavaOnevision
    from ..train import KDModels, make_optimizer, make_train_step
    from ..utils.synthetic import synthetic_kd_batch

    if mesh is None:
        mesh = make_mesh(mesh_cfg)
    global_batch = per_dp_batch * mesh_cfg.data * mesh_cfg.fsdp

    student = LlavaOnevision(
        scfg, dtype=param_dtype, remat=True, remat_vision=True,
        attn_impl=attn_impl,
    )
    quant = teacher_quant in ("int8", "int8_full")
    teacher = LlavaOnevision(
        tcfg, dtype=param_dtype, remat=True, remat_vision=True,
        attn_impl=attn_impl,
        # mesh program: GSPMD cannot partition the Pallas int8 kernel
        lm_quant="int8_xla" if quant else "none",
        vision_quant="int8_xla" if teacher_quant == "int8_full" else "none",
        # int8 token embedding; the int8 lm_head rides the loss wrappers
        # as a (kernel_q, kernel_scale) pair (ops/fused_spmd.py) — each
        # chip holds the replicated head at half the bf16 bytes
        embed_quant=teacher_embed_quant,
    )

    batch_np = synthetic_kd_batch(
        scfg, batch_size=global_batch, seq_len=seq_len,
        orig_sizes=[orig] * global_batch, accum=accum, seed=0,
    )
    bsh = batch_sharding(mesh, accum=True)
    abstract_batch = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=bsh)
        for k, v in batch_np.items()
    }
    micro = {k: jax.ShapeDtypeStruct(v.shape[1:], v.dtype)
             for k, v in batch_np.items()}

    def init_params(model, prefix):
        def f(ids, am, pv, pidx, pw, pva, tv):
            return model.init(
                jax.random.PRNGKey(0),
                input_ids=ids, attention_mask=am, pixel_values=pv,
                pack_idx=pidx, pack_weight=pw, pack_valid=pva,
                tile_valid=tv,
            )["params"]

        return jax.eval_shape(
            f,
            micro[f"{prefix}_input_ids"],
            micro[f"{prefix}_attention_mask"],
            micro[f"{prefix}_pixel_values"],
            micro["pack_idx"],
            micro["pack_weight"],
            micro["pack_valid"],
            micro["tile_valid"],
        )

    def cast_params(tree):
        # flax init declares f32 params regardless of compute dtype; the
        # production configuration stores bf16 (bench.py _materialize).
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape,
                param_dtype if s.dtype == jnp.float32 else s.dtype,
            ),
            tree,
        )

    sparams = cast_params(init_params(student, "student"))
    tparams = cast_params(
        init_params(LlavaOnevision(tcfg, dtype=param_dtype), "teacher")
    )
    if quant:
        from ..ops.int8 import quantize_lm_params_int8

        tparams = jax.eval_shape(
            lambda p: quantize_lm_params_int8(
                p, include_vision=teacher_quant == "int8_full",
                include_embed_head=teacher_embed_quant == "int8",
            ),
            tparams,
        )

    cfg = TrainConfig(
        kd_mode="double_trouble", phase=phase,
        loss=kd_loss_config_for("double_trouble"),
        loss_chunk_size=loss_chunk_size,
        ce_impl="fused",
        fused_local_impl=fused_local_impl,
        mesh_shape=mesh_cfg.shape,
    )

    tx = make_optimizer(
        sparams, cfg.learning_rate, cosine_t_max=cfg.cosine_t_max,
        steps_per_epoch=100, kd_mode=cfg.kd_mode, phase=cfg.phase,
    )
    abstract_state = jax.eval_shape(
        lambda p: TrainState.create(apply_fn=None, params=p, tx=tx), sparams
    )

    sspecs = _flat_param_specs(sparams, mesh)
    tspecs = _flat_param_specs(tparams, mesh)
    abstract_state = _with_shardings(
        abstract_state, _suffix_spec_tree(abstract_state, sspecs), mesh
    )
    abstract_tparams = _with_shardings(
        tparams, _suffix_spec_tree(tparams, tspecs), mesh
    )

    step = make_train_step(KDModels(student, teacher), cfg)
    jitted = jax.jit(step, donate_argnums=(0,) if donate_state else ())
    return jitted, (abstract_state, abstract_tparams, abstract_batch), mesh


def aot_compile_kd_step(*args, **kwargs):
    """Lower + compile the sharded KD step without materializing weights.

    Returns ``(compiled, stats)``; ``stats`` is per-device byte counts from
    ``compiled.memory_analysis()`` plus hand-computed parameter footprints.
    """
    jitted, abstract, mesh = build_kd_step_for_aot(*args, **kwargs)
    with jax.set_mesh(mesh):
        compiled = jitted.lower(*abstract).compile()
    ma = compiled.memory_analysis()
    stats = {
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "peak_bytes": int(ma.peak_memory_in_bytes),
        "generated_code_bytes": int(ma.generated_code_size_in_bytes),
    }
    # live-at-peak estimate: arguments stay resident for the whole step
    # (donated ones are counted via alias), outputs are written before
    # args die under donation => args + outputs - aliased + temps
    stats["per_chip_hbm_estimate"] = (
        stats["argument_bytes"] + stats["output_bytes"]
        - stats["alias_bytes"] + stats["temp_bytes"]
    )
    return compiled, stats


def sharded_param_bytes(params_abstract, mesh) -> int:
    """Per-chip parameter bytes under the partition rules (exact: each
    leaf's byte size divided by the product of mesh axes its spec uses)."""
    from flax import traverse_util

    specs = param_partition_specs(params_abstract, mesh)
    flat_p = traverse_util.flatten_dict(params_abstract, keep_empty_nodes=False)
    flat_s = traverse_util.flatten_dict(specs, keep_empty_nodes=False)
    total = 0
    for path, leaf in flat_p.items():
        spec = flat_s[path]
        div = 1
        for ax in spec:
            if ax is None:
                continue
            for a in (ax,) if isinstance(ax, str) else ax:
                div *= mesh.shape[a]
        total += int(np.prod(leaf.shape)) * leaf.dtype.itemsize // div
    return total


def teacher_7b_student_05b(
    layers: Optional[int] = None, max_tiles: int = 5
) -> Tuple[LlavaOnevisionConfig, LlavaOnevisionConfig]:
    """The product model pair (`OnlineKnowledgeDistillationLLavaOneVision.py:
    29-59`): 7B teacher + 0.5B student, optionally depth-reduced."""
    scfg = dataclasses.replace(llava_onevision_0_5b(), max_tiles=max_tiles)
    tcfg = dataclasses.replace(llava_onevision_7b(), max_tiles=max_tiles)
    if layers is not None:
        scfg, tcfg = depth_reduced(scfg, layers), depth_reduced(tcfg, layers)
    return scfg, tcfg
