"""AOT-compile the phase-3 KD step at real 7B-teacher scale on a virtual
8-device mesh and print the per-chip HBM table.

No weights are materialized (``jax.eval_shape`` params); the value of the
run is (a) the compile itself — partition rules exercised at the true
152128-vocab / 3584-hidden / 28-head dimensions — and (b)
``compiled.memory_analysis()`` per-chip byte budgets vs the 16 GB of a
v5e chip.

Usage:
  python scripts/aot_7b.py                     # full-depth, bf16 + int8
  python scripts/aot_7b.py --layers 2          # width-exact, depth-reduced
  python scripts/aot_7b.py --mesh 1,2,4 --quant int8_full
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=None,
                    help="depth-reduce both models to N layers (widths stay "
                    "real); default = full depth (28 teacher / 24 student)")
    ap.add_argument("--mesh", type=str, default="1,2,4",
                    help="data,fsdp,tensor (product = device count)")
    ap.add_argument("--quant", choices=["none", "int8", "int8_full"],
                    default="int8_full",
                    help="teacher quantization (int8_full is the product "
                    "configuration exercised by dryrun_multichip)")
    ap.add_argument("--embed_quant", choices=["none", "int8"],
                    default="none",
                    help="int8: per-row int8 teacher token embedding + "
                    "int8 lm_head streamed through the loss wrappers "
                    "(measured -0.90 GiB/chip at 2 layers on (1,2,4))")
    ap.add_argument("--seq_len", type=int, default=3072)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--per_dp_batch", type=int, default=1)
    args = ap.parse_args()

    d, f, t = (int(x) for x in args.mesh.split(","))
    n = d * f * t

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel.aot import (
        aot_compile_kd_step,
        sharded_param_bytes,
        teacher_7b_student_05b,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel.mesh import (
        MeshConfig,
        make_mesh,
    )

    scfg, tcfg = teacher_7b_student_05b(layers=args.layers)
    mesh_cfg = MeshConfig(data=d, fsdp=f, tensor=t)

    t0 = time.time()
    compiled, stats = aot_compile_kd_step(
        scfg, tcfg, mesh_cfg,
        seq_len=args.seq_len, per_dp_batch=args.per_dp_batch,
        accum=args.accum, teacher_quant=args.quant,
        teacher_embed_quant=args.embed_quant,
    )
    dt = time.time() - t0

    mesh = make_mesh(mesh_cfg)
    import jax.numpy as jnp

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
        LlavaOnevision,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )

    # independent parameter-footprint cross-check
    b = synthetic_kd_batch(scfg, batch_size=1, seq_len=args.seq_len,
                           orig_sizes=[(530, 730)], seed=0)
    micro = {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in b.items()}

    def shapes(cfg, prefix):
        m = LlavaOnevision(cfg, dtype=jnp.bfloat16)

        def f(ids, am, pv, pidx, pw, pva, tv):
            return m.init(
                jax.random.PRNGKey(0), input_ids=ids, attention_mask=am,
                pixel_values=pv, pack_idx=pidx, pack_weight=pw,
                pack_valid=pva, tile_valid=tv,
            )["params"]

        return jax.eval_shape(
            f, micro[f"{prefix}_input_ids"],
            micro[f"{prefix}_attention_mask"],
            micro[f"{prefix}_pixel_values"], micro["pack_idx"],
            micro["pack_weight"], micro["pack_valid"], micro["tile_valid"],
        )

    def bf16(tree):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
            ),
            tree,
        )

    sp, tp = bf16(shapes(scfg, "student")), bf16(shapes(tcfg, "teacher"))
    if args.quant != "none":
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
            quantize_lm_params_int8,
        )
        tp = jax.eval_shape(
            lambda p: quantize_lm_params_int8(
                p, include_vision=args.quant == "int8_full",
                include_embed_head=args.embed_quant == "int8"), tp)

    gib = 1 << 30
    out = {
        "mesh": {"data": d, "fsdp": f, "tensor": t},
        "layers": args.layers or "full",
        "teacher_quant": args.quant,
        "teacher_embed_quant": args.embed_quant,
        "seq_len": args.seq_len,
        "global_batch": args.per_dp_batch * d * f,
        "accum": args.accum,
        "compile_seconds": round(dt, 1),
        "per_chip": {k: v for k, v in stats.items()},
        "per_chip_gib": {
            k: round(v / gib, 3) for k, v in stats.items()
            if k.endswith("bytes") or k.endswith("estimate")
        },
        "student_param_bytes_per_chip": sharded_param_bytes(sp, mesh),
        "teacher_param_bytes_per_chip": sharded_param_bytes(tp, mesh),
        "hbm_budget_ok": stats["per_chip_hbm_estimate"] < 16 * gib,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
