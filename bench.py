"""Benchmark: baseline_depth train step (0.5B OneVision student, CE loss)
on realistic SUNRGBD anyres shapes, single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/s", "vs_baseline": N}

``vs_baseline`` compares against an estimated reference throughput: the
reference publishes no speed numbers (SURVEY.md §6), so we use a
FLOPs-derived estimate of its PyTorch-Lightning fp16 single-A100 step:
~3.0e13 train FLOPs/sample at 15% MFU of 312 TFLOP/s => ~1.6 samples/s
(batch-size-1 eager Lightning+HF rarely exceeds 10-20% MFU; at an
optimistic 40% MFU the reference would be ~4.2 samples/s — divide
``vs_baseline`` by 2.6 for that reading).

Usage:
  python bench.py                 # real chip, realistic shapes
  python bench.py --cpu           # tiny smoke on CPU
  python bench.py --mode kd       # double-trouble phase-3 KD step with a
                                  # width-scaled teacher sized to one chip
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REF_A100_SAMPLES_PER_SEC = 1.6  # documented estimate, see module docstring


def _flops_per_sample(params, seq_len: int, n_tiles: int, t_per_tile: int) -> float:
    """~Train FLOPs/sample: 6*P*T per subsystem (fwd 2PT, bwd 4PT)."""
    import numpy as np
    import jax

    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))

    p_vis = count(params["vision_tower"]) + count(params["multi_modal_projector"])
    lm = params["language_model"]
    p_emb = count(lm["embed_tokens"])
    p_lm = count(lm) - p_emb
    head = p_emb  # tied head matmul
    return 6.0 * (
        p_vis * n_tiles * t_per_tile + (p_lm + head) * seq_len
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--mode", choices=["baseline_depth", "kd"],
                    default="baseline_depth")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from flax.training.train_state import TrainState

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
        TrainConfig,
        kd_loss_config_for,
        llava_onevision_0_5b,
        llava_onevision_tiny,
        llava_onevision_tiny_teacher,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
        LlavaOnevision,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train import (
        KDModels,
        make_optimizer,
        make_train_step,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.anyres import (
        num_tiles,
    )

    if args.cpu:
        scfg = llava_onevision_tiny()
        tcfg = llava_onevision_tiny_teacher()
        seq_len, orig = 96, (45, 67)
        chunk = 32
        dtype = jnp.float32
        attn_impl = "xla"
    else:
        import dataclasses

        # SUNRGBD NYU-Kinect frames are 530x730: 2x3 anyres grid, 7 tiles,
        # 4833 packed image tokens (+ text) -> static bucket 4864.  The
        # static tile budget is trimmed to 8 (7 real + 1 spare) — the
        # default 10 wastes 30% of vision compute/memory on padding here.
        scfg = dataclasses.replace(llava_onevision_0_5b(), max_tiles=8)
        tcfg = None  # kd mode builds a scaled teacher below
        seq_len, orig = 4864, (530, 730)
        chunk = 256
        dtype = jnp.bfloat16
        attn_impl = "pallas"  # flash kernels: no [H,S,S] prob tensors

    student = LlavaOnevision(scfg, dtype=dtype, remat=True, attn_impl=attn_impl)
    batch = synthetic_kd_batch(
        scfg, batch_size=args.batch, seq_len=seq_len,
        orig_sizes=[orig] * args.batch, accum=1, seed=0,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    micro = jax.tree.map(lambda x: x[0], batch)

    def shapes(model, key, prefix):
        return jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(key),
                input_ids=micro[f"{prefix}_input_ids"],
                attention_mask=micro[f"{prefix}_attention_mask"],
                pixel_values=micro[f"{prefix}_pixel_values"],
                pack_idx=micro["pack_idx"],
                pack_weight=micro["pack_weight"],
                pack_valid=micro["pack_valid"],
                tile_valid=micro["tile_valid"],
            )["params"]
        )

    def materialize(shape_tree, seed):
        """Random-normal params on device (cheap; avoids any possibility of
        zero-value fast paths skewing the measurement)."""
        leaves, treedef = jax.tree.flatten(shape_tree)

        @jax.jit
        def init(key):
            keys = jax.random.split(key, max(len(leaves), 1))
            return [
                jax.random.normal(keys[i], leaves[i].shape, dtype) * 0.02
                for i in range(len(leaves))
            ]

        return jax.tree.unflatten(treedef, init(jax.random.PRNGKey(seed)))

    sparams = materialize(shapes(student, 0, "student"), 0)

    if args.mode == "kd":
        if tcfg is None:
            import dataclasses

            # Single-chip KD bench: teacher scaled to ~1.2B so teacher fwd +
            # student train fit one 16GB chip (the real 7B teacher is a
            # multi-chip tensor-parallel config; see dryrun_multichip).
            base = llava_onevision_0_5b()
            tcfg = dataclasses.replace(
                base,
                text=dataclasses.replace(
                    base.text, hidden_size=1536, intermediate_size=4096,
                    num_attention_heads=12, num_key_value_heads=2,
                    head_dim=128, tie_word_embeddings=False,
                ),
            )
        teacher = LlavaOnevision(tcfg, dtype=dtype, remat=True, attn_impl=attn_impl)
        tparams = materialize(shapes(teacher, 1, "teacher"), 1)
        # Single-chip KD bench runs double-trouble PHASE 1.  Phases 2/3 were
        # retried with the fully-fused streaming LoCa/CE path and still
        # exceed 16 GB by ~2.4 GB (teacher fwd + student train + optimizer
        # at S=4864 is structurally ~18 GB); they are the multi-chip
        # teacher-TP configuration (see dryrun_multichip).
        cfg = TrainConfig(
            kd_mode="double_trouble", phase=1,
            loss=kd_loss_config_for("double_trouble"),
            loss_chunk_size=chunk if args.cpu else 128,
            ce_impl="chunked" if args.cpu else "fused",
        )
        models = KDModels(student, teacher)
    else:
        teacher, tparams = None, None
        cfg = TrainConfig(
            kd_mode="baseline", loss_chunk_size=chunk,
            ce_impl="chunked" if args.cpu else "fused",
        )
        models = KDModels(student, None)

    tx = make_optimizer(sparams, 2e-5)
    state = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    step = jax.jit(make_train_step(models, cfg), donate_argnums=(0,))

    # Sync caveat: through the axon tunnel ``block_until_ready`` returns
    # before device completion; only a host fetch truly synchronizes.  Each
    # timed step therefore fetches the loss scalar (~30 ms RTT, small
    # against the ~0.5 s step).  Loss values are printed so a reviewer can
    # confirm real execution (they must evolve under the optimizer).
    def fetch(m):
        return float(jax.device_get(m["loss"]))

    t0 = time.time()
    state, metrics = step(state, tparams, batch)
    loss0 = fetch(metrics)
    print(f"compile+first step: {time.time()-t0:.1f}s loss={loss0:.4f}",
          file=sys.stderr)
    # second warmup: absorbs any residual lazy work before timing
    state, metrics = step(state, tparams, batch)
    fetch(metrics)

    t0 = time.time()
    losses = []
    for i in range(args.steps):
        state, metrics = step(state, tparams, batch)
        losses.append(fetch(metrics))
        print(f"  step {i}: loss={losses[-1]:.5f} cum={time.time()-t0:.2f}s",
              file=sys.stderr)
    dt = time.time() - t0
    if len(set(f"{l:.6f}" for l in losses)) == 1 and args.steps > 2:
        print("WARNING: loss did not evolve across steps — timing may not "
              "reflect real execution", file=sys.stderr)

    samples_per_sec = args.steps * args.batch / dt
    nt = num_tiles(orig, scfg.image_grid_pinpoints, scfg.vision.image_size)
    fl = _flops_per_sample(
        state.params, seq_len, min(nt, scfg.max_tiles),
        scfg.vision.tokens_per_patch,
    )
    tflops = samples_per_sec * fl / 1e12
    print(
        f"{samples_per_sec:.3f} samples/s, ~{tflops:.1f} TFLOP/s "
        f"(model-FLOPs, excl. remat recompute), loss={float(metrics['loss']):.4f}",
        file=sys.stderr,
    )

    label = "kd_double_trouble" if args.mode == "kd" else "baseline_depth"
    model_tag = "tiny-cpu-smoke" if args.cpu else "0.5B student"
    print(json.dumps({
        "metric": f"{label} train samples/sec ({model_tag}, S={seq_len}, B={args.batch}, 1 chip)",
        "value": round(samples_per_sec, 4),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REF_A100_SAMPLES_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
