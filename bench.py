"""Benchmark suite for the kdss-tpu framework, single chip.

Default (no --mode) runs all three and prints ONE JSON line whose headline
metric is the KD train step — the actual product — with the baseline_depth
step and greedy generation as extra fields:

  {"metric": "kd_double_trouble_p3 ...", "value": N, "unit": "samples/s",
   "vs_baseline": N, "extras": {"baseline_depth_samples_per_sec": ...,
   "generation_tok_per_sec": ...}}

Modes:
  * ``baseline_depth`` — 0.5B OneVision student, depth stream, masked-CE
    train step on realistic SUNRGBD anyres shapes (530x730 -> 5 tiles,
    2936 real tokens, bucket S=3072).
  * ``kd`` — double-trouble phase 3 (LoCa + CE mix — the reference's
    headline config) with the REAL llava-onevision-7b teacher config
    (152128 vocab / 3584 hidden / 28 layers — the reference's actual
    workload; DEFAULT since r4), squeezed onto the one chip by
    materializing the teacher directly in its int8 layout plus the
    seq-chunked student MLP and the remat barrier (docs/PERF_NOTES.md
    "The real-7B fit").  ``--teacher standin`` selects the r1-r3
    ~1.2B width-scaled stand-in series instead (faster compile; fits
    without the levers).  The production 7B deployment is a multi-chip
    tensor-parallel configuration (docs/RUNBOOK_MULTICHIP.md); its
    sharded program is validated by ``__graft_entry__.dryrun_multichip``,
    tests/test_fused_spmd.py, and the 7B-shape AOT compile in
    tests/test_7b_scale.py.
  * ``generation`` — jit KV-cache greedy decode (flash-kernel prefill),
    32 new tokens on a ~3k-token anyres prompt, reference decode config
    (`evaluation/onevisionv3/evaluate_onevision.py:186-195`).

``vs_baseline`` compares against an estimated reference throughput: the
reference publishes no speed numbers (SURVEY.md §6), so we estimate its
PyTorch-Lightning fp16 single-A100 step on the SAME workload we measure:
per-sample model FLOPs (computed from the run's own params/shapes) at 15%
MFU of 312 TFLOP/s (batch-size-1 eager Lightning+HF rarely exceeds 10-20%
MFU; at an optimistic 40% MFU divide ``vs_baseline`` by 2.6).  The
estimate is recomputed per run so workload-shape fixes can't skew the
ratio.

Usage:
  python bench.py                       # full suite on the real chip
  python bench.py --cpu                 # tiny smoke on CPU
  python bench.py --mode kd --steps 4   # one mode only
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

REF_A100_SAMPLES_PER_SEC = 1.6  # documented estimate, see module docstring

# --accum_dtype flag value -> configs.TrainConfig.accum_dtype
_ACCUM_DTYPES = {"f32": "float32", "bf16": "bfloat16", "param": "param"}

# Raised scoped-VMEM limit for the big-block Pallas kernels (not a legal
# XLA_FLAGS entry on the client; passed per-compile via jit compiler
# options, which the axon terminal forwards).
SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


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
    # Tied models reuse the embedding as the head matmul (add p_emb once);
    # untied models carry an explicit lm_head already inside p_lm — adding
    # p_emb again double-counted the head for untied teachers (r3 fix; the
    # r2-recorded TFLOP/s and ref-est were ~5% optimistic for kd mode).
    head = 0 if "lm_head" in lm else p_emb
    return 6.0 * (
        p_vis * n_tiles * t_per_tile + (p_lm + head) * seq_len
    )


def _materialize(shape_tree, seed, dtype):
    """Random-normal params on device (cheap; avoids any possibility of
    zero-value fast paths skewing the measurement)."""
    import jax

    leaves, treedef = jax.tree.flatten(shape_tree)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, max(len(leaves), 1))
        return [
            jax.random.normal(keys[i], leaves[i].shape, dtype) * 0.02
            for i in range(len(leaves))
        ]

    return jax.tree.unflatten(treedef, init(jax.random.PRNGKey(seed)))


def _materialize_quantized(shape_tree, seed):
    """Materialize a quantized param tree directly in its final layout
    (int8 kernels + positive f32 scales + bf16 leftovers) so the
    full-precision intermediate never exists on the chip — at the real 7B
    teacher the bf16 tree alone is ~16 GB, i.e. the whole chip."""
    import jax
    import jax.numpy as jnp
    from jax.tree_util import keystr, tree_flatten_with_path

    paths_leaves, treedef = tree_flatten_with_path(shape_tree)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, max(len(paths_leaves), 1))
        out = []
        for i, (path, leaf) in enumerate(paths_leaves):
            if jnp.issubdtype(leaf.dtype, jnp.integer):
                out.append(jax.random.randint(
                    keys[i], leaf.shape, -127, 128, jnp.int32
                ).astype(leaf.dtype))
            elif "scale" in keystr(path):
                # dequant scales must be positive; magnitude matches what
                # quantizing N(0, 0.02) weights would produce (~max/127)
                out.append(jax.random.uniform(
                    keys[i], leaf.shape, jnp.float32, 0.5, 1.5
                ).astype(leaf.dtype) * 6e-4)
            else:
                out.append((jax.random.normal(
                    keys[i], leaf.shape, jnp.float32) * 0.02).astype(leaf.dtype))
        return out

    return jax.tree.unflatten(treedef, init(jax.random.PRNGKey(seed)))


def _shapes(model, micro, key, prefix):
    import jax

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


def _configs(args):
    import dataclasses

    import jax.numpy as jnp

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
        llava_onevision_0_5b,
        llava_onevision_7b,
        llava_onevision_tiny,
        llava_onevision_tiny_teacher,
    )

    if args.cpu:
        return dict(
            scfg=llava_onevision_tiny(), tcfg=llava_onevision_tiny_teacher(),
            seq_len=96, orig=(45, 67), chunk=32, dtype=jnp.float32,
            attn_impl="xla",
        )
    # SUNRGBD NYU-Kinect frames are 530x730: anyres best-fit is (768,768)
    # (verified against HF's select_best_resolution) = 2x2 grid + base =
    # 5 tiles, 2929 packed image tokens + QA text = 2936 real tokens ->
    # the production loader buckets this at 3072.  (Round 1 benched
    # S=4864 / 8 tiles from a miscount — 40% of that workload was
    # padding; docs/PERF_NOTES.md keeps both series.)
    scfg = dataclasses.replace(llava_onevision_0_5b(), max_tiles=5)
    if getattr(args, "teacher", "standin") == "7b":
        # The REAL 7B teacher config (152128 vocab / 3584 hidden / 28
        # layers) executed on ONE chip: int8 teacher (~8 GB) + the 0.5B
        # student train state squeeze under 16 GB with the teacher
        # materialized directly in quantized form and the 1.9 GB
        # materialized-teacher-logits buffer disabled (see bench_train).
        return dict(
            scfg=scfg,
            tcfg=dataclasses.replace(llava_onevision_7b(), max_tiles=5),
            seq_len=3072, orig=(530, 730), chunk=256, dtype=jnp.bfloat16,
            attn_impl="pallas",
        )
    # Single-chip KD bench teacher scaled to ~1.2B so teacher fwd +
    # student train fit one 16GB chip (the real 7B teacher is a
    # multi-chip tensor-parallel config; see dryrun_multichip).
    base = llava_onevision_0_5b()
    tcfg = dataclasses.replace(
        base,
        max_tiles=5,
        text=dataclasses.replace(
            base.text, hidden_size=1536, intermediate_size=4096,
            num_attention_heads=12, num_key_value_heads=2,
            head_dim=128, tie_word_embeddings=False,
        ),
    )
    return dict(
        scfg=scfg, tcfg=tcfg, seq_len=3072, orig=(530, 730), chunk=256,
        dtype=jnp.bfloat16, attn_impl="pallas",
    )


def bench_train(args, mode: str) -> dict:
    import jax
    import jax.numpy as jnp
    from flax.training.train_state import TrainState

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
        TrainConfig,
        kd_loss_config_for,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.anyres import (
        num_tiles,
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

    # resolve the batch default per mode WITHOUT mutating the shared
    # namespace (--mode all reuses args across modes): kd at the real-7B
    # workload defaults to B=2 (fits with >1 GB headroom post vd-head +
    # pixel-precast; measured +2.1% over B=1 — docs/PERF_NOTES.md r5)
    import copy

    args = copy.copy(args)
    if args.batch is None:
        args.batch = (2 if mode == "kd" and args.teacher == "7b"
                      and not args.cpu else 1)

    c = _configs(args)
    scfg, tcfg = c["scfg"], c["tcfg"]
    seq_len, orig, chunk, dtype = c["seq_len"], c["orig"], c["chunk"], c["dtype"]
    attn_impl = c["attn_impl"]

    # --mesh d,f,t: run the SAME workload under a jax.sharding.Mesh with
    # the production multi-chip code paths — flash_attention_spmd and the
    # fused losses inside shard_map ("pallas" local impl).  With 1,1,1 on
    # the single real chip this executes the exact custom-call-in-shard_map
    # program the multi-chip configuration uses (modulo collectives), which
    # otherwise never runs on hardware; the loss trace must match the
    # no-mesh run.
    mesh = None
    if getattr(args, "mesh", None):
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel import (
            MeshConfig,
            make_mesh,
        )

        d, f, t = (int(x) for x in args.mesh.split(","))
        mesh = make_mesh(MeshConfig(d, f, t))
        if args.batch % (d * f) != 0:
            nb = -(-args.batch // (d * f)) * (d * f)
            print(f"WARNING: --batch {args.batch} not divisible by "
                  f"data*fsdp={d * f}; raising to {nb} (batch shards over "
                  "the data and fsdp axes)", file=sys.stderr)
            args.batch = nb
        # CPU preflight (--cpu --mesh d,f,t): the same sharded program on
        # the virtual host platform with the XLA inner loss impl
        # (interpret-mode Pallas hangs inside shard_map on CPU); on
        # hardware the only delta is the Pallas backend.
        attn_impl = attn_impl if args.cpu else "pallas_spmd"

    remat = args.remat != "none"
    remat_vision = args.remat == "full"
    # Student remat granularity: "dots" saves the projection outputs so
    # backward recomputes only elementwise/attention work (the teacher has
    # no backward, so its remat never recomputes — keep it "full").
    vattn = (None if getattr(args, "vision_attn", "auto") == "auto"
             else args.vision_attn)
    # The 7B fit levers apply ONLY to the mode that carries the 7B
    # teacher: r4 keyed them on args.teacher alone, which silently turned
    # them on for baseline_depth too once 7b became the default teacher —
    # the memory-over-speed levers cost that teacher-less step 13%
    # (3.88 -> 3.36 samples/s, the untriaged BENCH_r04 regression;
    # triaged r5 via the same-window A/B in docs/AB_STREAM_r05.json).
    is_7b = args.teacher == "7b" and not args.cpu and mode == "kd"
    mlp_chunk = args.mlp_chunk
    if mlp_chunk is None:
        # the real-7B bench needs the student MLP-remat carpet capped to
        # fit 16 GiB (see models/qwen2.py::Qwen2MLP.seq_chunk); the
        # stand-in fits without it, keep the faster unchunked MLP there
        mlp_chunk = 1024 if is_7b else 0
    # remat_barrier: prevent XLA from CSE-saving forward values into the
    # backward (memory-over-speed; fit-enabling at --teacher 7b, off for
    # the roomier stand-in).  See models/qwen2.py::Qwen2LM.remat_barrier.
    barrier = is_7b if args.remat_barrier == "auto" else args.remat_barrier == "on"
    student = LlavaOnevision(scfg, dtype=dtype, remat=remat,
                             remat_vision=remat_vision, attn_impl=attn_impl,
                             vision_attn_impl=vattn,
                             remat_policy=args.remat_policy,
                             mlp_chunk=mlp_chunk, remat_barrier=barrier)
    batch = synthetic_kd_batch(
        scfg, batch_size=args.batch, seq_len=seq_len,
        orig_sizes=[orig] * args.batch, accum=args.accum, seed=0,
    )
    batch = jax.tree.map(jnp.asarray, batch)
    if not args.cpu and dtype == jnp.bfloat16:
        # Feed pixels pre-cast to the model dtype: the vision towers'
        # first op is pixel_values.astype(bf16) (models/siglip.py:109),
        # so the host cast is value-identical — and it halves the pixel
        # input buffer AND kills the loop-invariant [accum, ...] convert
        # temps XLA hoists out of the accumulation scan (2 x 33.75 MB at
        # accum=8 — the r5 accum-fit dumps, docs/PERF_NOTES.md).
        batch = {k: (v.astype(jnp.bfloat16)
                     if k.endswith("pixel_values") else v)
                 for k, v in batch.items()}
    micro = jax.tree.map(lambda x: x[0], batch)
    sparams = _materialize(_shapes(student, micro, 0, "student"), 0, dtype)

    if mode == "kd":
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
            quant_impl,
        )

        tq = args.teacher_quant
        # int8 token embedding + int8 lm_head streamed by the loss
        # kernels: the fit-enabling lever for --teacher 7b (saves the
        # 1.1 GB embed half + the 1.1 GB bf16 head copy), measured
        # opt-in for the stand-in.
        eh = args.teacher_embed_quant
        if eh == "auto":
            eh = "int8" if tq in ("int8", "int8_full") else "none"
        if eh == "int8" and tq not in ("int8", "int8_full"):
            raise SystemExit(
                "--teacher_embed_quant int8 requires --teacher_quant "
                "int8/int8_full (quantize_lm_params_int8 drives both)")
        teacher = LlavaOnevision(
            tcfg, dtype=dtype, remat=remat, remat_vision=remat_vision,
            attn_impl=attn_impl, vision_attn_impl=vattn,
            lm_quant=quant_impl(gspmd=mesh is not None)
            if tq in ("int8", "int8_full") else "none",
            vision_quant=quant_impl(gspmd=mesh is not None)
            if tq == "int8_full" else "none",
            embed_quant=eh,
        )
        tshapes = _shapes(LlavaOnevision(tcfg, dtype=dtype), micro, 1,
                          "teacher")
        if is_7b:
            import os

            # The f32 materialized-teacher-logits buffer is 1.9 GB at the
            # 152128 vocab — unaffordable beside the 8 GB int8 teacher.
            # At B>=2 the measured winner is the row-chunked bf16 tmat
            # (KDSS_LOCA_TMAT=bf16, chunk 512: one 149 MB [512, V] slab
            # live at a time, materialized by the vocab-streaming Pallas
            # int8 kernel): 1.7684 samples/s / 113.7 TFLOP/s vs 1.688
            # recompute, loss trace identical to 5 decimals
            # (docs/PERF_NOTES.md "tmat fit campaign").  B=1 + tmat
            # runtime-OOMs (measured) — recompute there.  Overridable.
            if args.batch >= 2:
                os.environ.setdefault("KDSS_LOCA_TMAT", "bf16")
                os.environ.setdefault("KDSS_LOCA_TMAT_CHUNK", "512")
            else:
                os.environ.setdefault("KDSS_LOCA_TMAT", "0")
            if tq not in ("int8", "int8_full"):
                print("WARNING: --teacher 7b at bf16 is ~16 GB of weights "
                      "— expect RESOURCE_EXHAUSTED on a 16 GB chip; use "
                      "--teacher_quant int8_full", file=sys.stderr)
        if tq in ("int8", "int8_full"):
            from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
                quantize_lm_params_int8,
            )
            quantize = functools.partial(
                quantize_lm_params_int8, include_vision=tq == "int8_full",
                include_embed_head=eh == "int8",
            )
            if is_7b:
                # materialize straight into the quantized layout — the
                # bf16 7B intermediate alone would fill the whole chip
                bf16_shapes = jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(
                        s.shape,
                        dtype if s.dtype == jnp.float32 else s.dtype),
                    tshapes,
                )
                tparams = _materialize_quantized(
                    jax.eval_shape(quantize, bf16_shapes), 1)
            else:
                tparams = jax.jit(quantize)(_materialize(tshapes, 1, dtype))
        else:
            tparams = _materialize(tshapes, 1, dtype)
        # Single-chip KD bench runs double-trouble phase 3 by default
        # (--kd_phase; see module docstring).
        import dataclasses

        loss_cfg = kd_loss_config_for("double_trouble")
        if args.loca_faithful:
            loss_cfg = dataclasses.replace(
                loss_cfg, loca_faithful_indexing=True)
        cfg = TrainConfig(
            kd_mode="double_trouble", phase=args.kd_phase,
            loss=loss_cfg,
            loss_chunk_size=chunk if args.cpu else 128,
            ce_impl="chunked" if args.cpu and mesh is None else "fused",
            fused_local_impl="xla" if args.cpu else "pallas",
            accum_dtype=_ACCUM_DTYPES[args.accum_dtype],
        )
        models = KDModels(student, teacher)
    else:
        teacher, tparams = None, None
        cfg = TrainConfig(
            kd_mode="baseline", loss_chunk_size=chunk,
            ce_impl="chunked" if args.cpu and mesh is None else "fused",
            fused_local_impl="xla" if args.cpu else "pallas",
            accum_dtype=_ACCUM_DTYPES[args.accum_dtype],
        )
        models = KDModels(student, None)

    if mesh is not None:
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.parallel.sharding import (
            shard_batch,
            shard_params,
        )

        # Setter form so step tracing below sees the mesh; the returned
        # handle restores the previous (empty) mesh before this bench
        # returns, so later modes in --mode all run mesh-free.
        mesh_ctx = jax.set_mesh(mesh)
        sparams = shard_params(sparams, mesh)
        if tparams is not None:
            tparams = shard_params(tparams, mesh)
        batch = shard_batch(batch, mesh, accum=True)

    tx = make_optimizer(
        sparams, 2e-5,
        mu_dtype="bfloat16" if args.mu_dtype == "bf16" else None,
    )
    state = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    copts = None
    if not args.cpu:
        copts = dict(SCOPED_VMEM_OPTS)
        for kv in args.xla_opt:
            k, v = kv.split("=", 1)
            copts[k] = v
    elif args.xla_opt:
        print("WARNING: --xla_opt ignored under --cpu (TPU-only compiler "
              "options)", file=sys.stderr)
    step = jax.jit(
        make_train_step(models, cfg), donate_argnums=(0,),
        compiler_options=copts,
    )

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
    print(f"[{mode}] compile+first step: {time.time()-t0:.1f}s loss={loss0:.4f}",
          file=sys.stderr)
    # second warmup: absorbs any residual lazy work before timing
    state, metrics = step(state, tparams, batch)
    fetch(metrics)

    profiling = getattr(args, "profile_dir", None)
    if profiling:
        jax.profiler.start_trace(profiling)
    # Fetch pipelined one step behind: the per-step ~30 ms tunnel RTT
    # then overlaps the next step's device work instead of stalling it
    # (one trailing fetch still bounds the measurement by real device
    # completion; per-step losses keep proving real execution).
    t0 = time.time()
    losses = []
    pending = None
    for i in range(args.steps):
        state, metrics = step(state, tparams, batch)
        if pending is not None:
            losses.append(fetch(pending))
            print(f"  step {i-1}: loss={losses[-1]:.5f} "
                  f"cum={time.time()-t0:.2f}s", file=sys.stderr)
        pending = metrics
    losses.append(fetch(pending))
    print(f"  step {args.steps-1}: loss={losses[-1]:.5f} "
          f"cum={time.time()-t0:.2f}s", file=sys.stderr)
    dt = time.time() - t0
    if profiling:
        jax.profiler.stop_trace()
    if len(set(f"{l:.6f}" for l in losses)) == 1 and args.steps > 2:
        print("WARNING: loss did not evolve across steps — timing may not "
              "reflect real execution", file=sys.stderr)

    samples_per_sec = args.steps * args.batch * args.accum / dt
    nt = num_tiles(orig, scfg.image_grid_pinpoints, scfg.vision.image_size)
    fl = _flops_per_sample(
        state.params, seq_len, min(nt, scfg.max_tiles),
        scfg.vision.tokens_per_patch,
    )
    if mode == "kd" and tparams is not None:
        # teacher runs forward-only in the same step: +2*P_t*T per sample
        fl += _flops_per_sample(tparams, seq_len, min(nt, scfg.max_tiles),
                                scfg.vision.tokens_per_patch) / 3.0
    tflops = samples_per_sec * fl / 1e12
    # Reference estimate computed from the SAME workload we measured:
    # eager Lightning+HF fp16 at ~15% MFU of an A100's 312 TFLOP/s
    # (module docstring).  Self-consistent across workload-shape fixes.
    ref_est = 0.15 * 312e12 / fl
    print(
        f"[{mode}] {samples_per_sec:.3f} samples/s, ~{tflops:.1f} TFLOP/s "
        f"(model-FLOPs, excl. remat recompute), ref-est {ref_est:.2f} "
        f"samples/s, loss={losses[-1]:.4f}",
        file=sys.stderr,
    )
    if mesh is not None:
        mesh_ctx.__exit__(None, None, None)
    return {
        "samples_per_sec": round(samples_per_sec, 4),
        "seq_len": seq_len,
        "batch": args.batch,
        "model_tflops_per_sec": round(tflops, 1),
        "ref_est_samples_per_sec": round(ref_est, 3),
        # per-step loss trace: the A/B drivers assert numerical parity
        # across kernel variants from this (canonical 7B trace: 11.9295
        # -> 11.82527 over 6 steps)
        "losses": [round(float(l), 5) for l in losses],
    }


def bench_eval_loop(args) -> dict:
    """The evaluator's per-row loop, end to end (VERDICT r4 #6).

    The reference's eval cost is NOT just model.generate: each row pays
    host image load + depth->3ch conversion + processor/tokenize + the
    decode + answer extraction
    (`evaluation/onevisionv3/evaluate_onevision.py:402-443`).  This mode
    drives the SAME machinery the eval CLI uses — SUNRGBDVQADataset
    (prewitt_imagenet quirk) over a synthetic on-disk tree at the
    production 530x730 resolution, OneVisionCollator(eval_mode=True),
    batched jit KV-cache Generator, eos-strip + digits_to_words — and
    reports rows/s plus the host/device wall split.
    """
    import os
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli.common import (
        ensure_synthetic_dataset,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.collate import (
        OneVisionCollator,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.dataset import (
        SUNRGBDVQADataset,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.tokenization import (
        HashTokenizer,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        GenerateConfig,
        Generator,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
        LlavaOnevision,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.numwords import (
        digits_to_words,
    )

    c = _configs(args)
    scfg, dtype, attn_impl = c["scfg"], c["dtype"], c["attn_impl"]
    bs = args.batch or 1
    n_batches = 2 if args.cpu else 4
    n_rows = bs * (n_batches + 1)  # +1 warmup/compile batch
    size = (45, 67) if args.cpu else (530, 730)  # production SUNRGBD
    new_tokens = 8 if args.cpu else 32

    root = ensure_synthetic_dataset(
        tempfile.mkdtemp(prefix="kdss_evalloop_"), n=n_rows, seed=0,
        size=size)
    ds = SUNRGBDVQADataset(
        root, "val_dataset.csv", None, depth_encoding="prewitt_imagenet")
    tok = HashTokenizer(
        vocab_size=scfg.text.vocab_size, pad_token_id=scfg.pad_token_id,
        eos_token_id=scfg.eos_token_id, image_token_id=scfg.image_token_id)
    collator = OneVisionCollator(
        scfg, tok, eval_mode=True,
        **({"buckets": (c["seq_len"],)} if args.cpu else {}))

    model = LlavaOnevision(scfg, dtype=dtype, attn_impl=attn_impl)
    # params via the same synthetic materialization as bench_generation
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )
    probe = synthetic_kd_batch(
        scfg, batch_size=bs, seq_len=c["seq_len"],
        orig_sizes=[c["orig"]] * bs, seed=3)
    probe = {k: jnp.asarray(v) for k, v in probe.items()
             if not k.startswith("teacher_")}
    params = _materialize(_shapes(
        LlavaOnevision(scfg, dtype=dtype), probe, 2, "student"), 2, dtype)
    gen = Generator(model, scfg, GenerateConfig(
        max_new_tokens=new_tokens, eos_token_id=scfg.eos_token_id))

    def run_batch(idxs):
        th0 = time.time()
        samples = [ds[i] for i in idxs]
        n_real = len(samples)
        if n_real < bs:
            samples = samples + [samples[-1]] * (bs - n_real)
        batch = collator(samples)
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if not k.startswith("teacher_") and k != "question_id"}
        th = time.time() - th0
        td0 = time.time()
        out = gen.generate(params, jb)
        seqs = np.asarray(out["sequences"])[:n_real]
        plens = np.asarray(out["prompt_lengths"])[:n_real]
        valid = np.asarray(out["valid"])[:n_real]
        td = time.time() - td0
        th0 = time.time()
        answers = []
        for j in range(n_real):
            ids = [int(t) for t, v in
                   zip(seqs[j, plens[j]:], valid[j, plens[j]:]) if v]
            if ids and ids[-1] == scfg.eos_token_id:
                ids = ids[:-1]
            answers.append(digits_to_words(tok.decode(ids)).lower().strip())
        th += time.time() - th0
        return th, td, answers

    t0 = time.time()
    run_batch(list(range(bs)))  # compile + warm
    print(f"[eval_loop] compile+first batch: {time.time()-t0:.1f}s",
          file=sys.stderr)
    host_s = dev_s = 0.0
    t0 = time.time()
    for bi in range(n_batches):
        idxs = list(range(bs * (bi + 1), bs * (bi + 2)))
        th, td, _ = run_batch(idxs)
        host_s += th
        dev_s += td
    dt = time.time() - t0
    rows_per_sec = n_batches * bs / dt
    print(f"[eval_loop] {rows_per_sec:.3f} rows/s (B={bs}, "
          f"img {size[0]}x{size[1]}, {new_tokens} new tokens; host "
          f"{host_s/dt*100:.0f}% / device {dev_s/dt*100:.0f}%)",
          file=sys.stderr)
    return {
        "rows_per_sec": round(rows_per_sec, 3),
        "batch": bs,
        "new_tokens": new_tokens,
        "host_frac": round(host_s / dt, 3),
        "device_frac": round(dev_s / dt, 3),
    }


def bench_generation(args) -> dict:
    """Greedy KV-cache decode: flash prefill + 32 new tokens (reference
    decode config, rep-penalty 1.2 + bigram ban)."""
    import jax
    import jax.numpy as jnp

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.decode import (
        GenerateConfig,
        Generator,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models import (
        LlavaOnevision,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.synthetic import (
        synthetic_kd_batch,
    )

    c = _configs(args)
    scfg, dtype, attn_impl = c["scfg"], c["dtype"], c["attn_impl"]
    seq_len, orig = c["seq_len"], c["orig"]
    new_tokens = 8 if args.cpu else 32

    sq = args.student_quant
    model = LlavaOnevision(
        scfg, dtype=dtype, attn_impl=attn_impl,
        lm_quant="int8" if sq in ("int8", "int8_full") else "none",
        vision_quant="int8" if sq == "int8_full" else "none",
    )
    b = args.batch or 1  # batched decode: the eval CLI's cheap multiplier
    batch = synthetic_kd_batch(
        scfg, batch_size=b, seq_len=seq_len, orig_sizes=[orig] * b, seed=3,
    )
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not k.startswith("teacher_")}
    params = _materialize(_shapes(
        LlavaOnevision(scfg, dtype=dtype), jb, 2, "student"), 2, dtype)
    if sq in ("int8", "int8_full"):
        from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
            quantize_lm_params_int8,
        )
        params = jax.jit(functools.partial(
            quantize_lm_params_int8, include_vision=sq == "int8_full",
        ))(params)
    gcfg = GenerateConfig(max_new_tokens=new_tokens, eos_token_id=-1)
    gen = Generator(model, scfg, gcfg)

    def run():
        out = gen.generate(params, jb)
        return jax.device_get(out["sequences"][:, -1])  # true sync

    t0 = time.time()
    run()
    print(f"[generation] compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
    run()  # warmup

    reps = 2 if args.cpu else 4
    t0 = time.time()
    for _ in range(reps):
        run()
    dt = (time.time() - t0) / reps
    tok_s = new_tokens * b / dt
    print(f"[generation] {dt*1e3:.0f} ms / {new_tokens} tokens x B={b} "
          f"(prompt {seq_len}) = {tok_s:.1f} tok/s", file=sys.stderr)

    out = {
        "tok_per_sec": round(tok_s, 1),
        "ms_per_call": round(dt * 1e3, 1),
        "prompt_len": seq_len,
        "new_tokens": new_tokens,
        "batch": b,
    }
    if args.decode_marginal and not args.cpu:
        # steady-state decode rate: marginal tokens/sec between a 32- and a
        # 96-token run at the same prompt (subtracts the shared prefill,
        # which dominates the headline tok/s above)
        gen2 = Generator(model, scfg,
                         GenerateConfig(max_new_tokens=new_tokens + 64,
                                        eos_token_id=-1))

        def run2():
            o = gen2.generate(params, jb)
            return jax.device_get(o["sequences"][:, -1])

        run2()  # compile
        run2()  # warm
        t0 = time.time()
        for _ in range(reps):
            run2()
        dt2 = (time.time() - t0) / reps
        if dt2 > 1.05 * dt:
            marginal = 64 * b / (dt2 - dt)
            print(f"[generation] marginal decode: {marginal:.1f} tok/s "
                  f"({dt2*1e3:.0f} ms at {new_tokens + 64} tokens)",
                  file=sys.stderr)
            out["decode_tok_per_sec"] = round(marginal, 1)
        else:
            # the two timings are within noise (< 5%): a subtraction-based
            # rate would be wildly inflated — report nothing instead
            print(f"[generation] marginal decode: not reported "
                  f"(dt2={dt2*1e3:.0f} ms within noise of dt={dt*1e3:.0f} "
                  "ms; rerun with a healthier tunnel window)",
                  file=sys.stderr)
            out["decode_tok_per_sec"] = None
    return out


def build_parser() -> argparse.ArgumentParser:
    """Bench flag surface, exposed so multi-arm drivers
    (scripts/flash_stream_ab.py) can build default-consistent args
    namespaces and run several configurations in ONE process — the
    remote compile service shares subprograms across close program
    variants within a session (measured 513 s -> 76 s, PERF_NOTES), so
    an in-process A/B matrix compiles several times faster than one
    subprocess per arm."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="tiny CPU smoke run")
    ap.add_argument("--mode",
                    choices=["all", "baseline_depth", "kd", "generation",
                             "eval_loop"],
                    default="all")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--kd_phase", type=int, default=3, choices=[1, 2, 3],
                    help="double-trouble phase for --mode kd; phase 3 "
                    "(the reference's headline config) fits one chip at "
                    "the realistic S=3072 workload via the fused LoCa "
                    "kernels (measured r2; phase 1: 2.84 samples/s)")
    ap.add_argument("--batch", type=int, default=None,
                    help="micro-batch size; default 2 for the real-7B kd "
                    "step (fits with >1 GB headroom since the vd-head + "
                    "pixel-precast levers and measured +2.1% over B=1 — "
                    "1.688 vs 1.653 samples/s, AB_RETRY_r05), 1 for "
                    "every other mode")
    ap.add_argument("--loca_faithful", action="store_true",
                    help="kd mode: route LoCa through the reference-"
                    "faithful fancy-indexing variant (seq-chunked since "
                    "r5 — losses/chunked.py::chunked_faithful_loca; the "
                    "accuracy-parity experiment path, now executable at "
                    "production shapes)")
    ap.add_argument("--accum_dtype", choices=["f32", "bf16", "param"],
                    default="f32",
                    help="gradient-accumulation carry dtype: f32 = exact "
                    "sum-then-divide (a 2 GB param-shaped buffer on the "
                    "0.5B student — the measured accum>=4 OOM at the 7B "
                    "workload); bf16/param = running mean in reduced "
                    "precision (~2^-8 relative noise per add, fits accum "
                    "8+ on one chip — see configs.py::accum_dtype)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-batches per step "
                    "(lax.scan inside the jit step; the reference trains "
                    "with accumulate_grad_batches=64, which amortizes the "
                    "optimizer update the accum=1 bench pays per sample)")
    ap.add_argument("--teacher", choices=["standin", "7b"],
                    default="7b",
                    help="kd mode teacher: the REAL llava-onevision-7b "
                    "config (152128 vocab / 3584 hidden / 28 layers; the "
                    "reference's actual workload — DEFAULT since r4, "
                    "measured 1.62 samples/s on one chip) executed via "
                    "int8 materialization + seq-chunked student MLP + "
                    "remat barrier, or the ~1.2B width-scaled 'standin' "
                    "(the r1-r3 headline series; faster compile, fits "
                    "without the memory levers)")
    ap.add_argument("--teacher_quant",
                    choices=["none", "int8", "int8_full"],
                    default="int8_full",
                    help="int8: w8a8 decoder-block matmuls for the frozen "
                    "teacher (MXU int8 path measures ~1.6x bf16; halves "
                    "teacher weight HBM) — see ops/int8.py")
    ap.add_argument("--teacher_embed_quant",
                    choices=["auto", "none", "int8"], default="auto",
                    help="int8: per-row int8 token embedding + int8 "
                    "lm_head streamed by the fused loss kernels (halves "
                    "embed+head HBM and removes the bf16 head copy). "
                    "auto = int8 whenever the teacher is int8-quantized "
                    "(fit-enabling for --teacher 7b; +1%% measured on "
                    "the stand-in, same loss trace)")
    ap.add_argument("--decode_marginal", action="store_true",
                    help="generation mode: also measure the steady-state "
                    "decode tok/s (marginal rate between 32- and 96-token "
                    "runs; the headline tok/s is prefill-dominated)")
    ap.add_argument("--remat_barrier", choices=["auto", "on", "off"],
                    default="auto",
                    help="prevent_cse on the towers' remat: stops XLA "
                    "from CSE-saving forward values into the backward "
                    "(memory-over-speed). auto = on for --teacher 7b")
    ap.add_argument("--mlp_chunk", type=int, default=None,
                    help="sequence-chunked student MLP (HBM-peak lever; "
                    "models/qwen2.py::Qwen2MLP.seq_chunk). Default: 1024 "
                    "when --teacher 7b (fit-enabling), else 0 (off)")
    ap.add_argument("--mu_dtype", choices=["f32", "bf16"], default="f32",
                    help="bf16: force Adam's first moment to bf16. "
                    "Measured no-op at the bf16-param bench configs "
                    "(optax already stores mu/nu in the param dtype); "
                    "only shrinks state for f32-param runs")
    ap.add_argument("--student_quant",
                    choices=["none", "int8", "int8_full"],
                    default="none",
                    help="generation mode only: serve the student with "
                    "w8a8 LM matmuls (decode at batch 1 is weight-"
                    "bandwidth-bound; int8 halves the bytes)")
    ap.add_argument("--vision_attn",
                    choices=["auto", "pallas", "xla", "xla_chunked"],
                    default="auto",
                    help="vision-tower attention impl override (train "
                    "modes); auto follows the LM impl. The tower is "
                    "non-causal S=729/d=72 where flash pads d to 128 "
                    "lanes — 'xla' materializes the small [T,768,768] "
                    "probs instead (A/B, see PERF_NOTES)")
    ap.add_argument("--flash_stream",
                    choices=["default", "off", "bound", "max"],
                    default="default",
                    help="flash fwd kernel family (KDSS_FLASH_STREAM): "
                    "'default' leaves the kernel default ('bound' since "
                    "r4: scalar-shift streaming fwd, 2.28x the carried "
                    "kernel at production shapes, NaN-loud outside its "
                    "norm envelope), 'off' = carried online softmax "
                    "(exact for any magnitude, the pre-r4 default), "
                    "'max' = per-row exact 2-pass validation reference")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="capture a jax.profiler trace of the timed steps")
    ap.add_argument("--xla_opt", action="append", default=[],
                    help="extra per-compile XLA compiler options key=val "
                    "(A/B experiments, e.g. scheduler knobs for the B=2 "
                    "HBM chase)")
    ap.add_argument("--mesh", type=str, default=None,
                    help="d,f,t: run the train modes under a "
                    "jax.sharding.Mesh with the production multi-chip "
                    "paths (flash + fused losses inside shard_map). "
                    "'1,1,1' on the single real chip executes exactly the "
                    "multi-chip program modulo collectives; the loss trace "
                    "must match the no-mesh run")
    ap.add_argument("--remat", type=str, default="full",
                    choices=["full", "lm", "none"],
                    help="rematerialization A/B: full (both towers), lm "
                    "(LM only), none")
    ap.add_argument("--remat_policy", type=str, default="full",
                    choices=["full", "dots", "flash"],
                    help="student remat granularity: full layer recompute "
                    "or dots (save projection outputs, recompute only "
                    "elementwise/attention — see models/qwen2.py)")
    return ap


def setup_env(args) -> None:
    """Process-level environment for a bench run (block budgets, platform
    selection, persistent compile cache).  Must run before the first
    traced call; shared by main() and the multi-arm drivers."""
    import os

    if args.flash_stream != "default":
        # trace-time read (PERF_NOTES env-flag convention): set before
        # the first traced call
        os.environ["KDSS_FLASH_STREAM"] = (
            "0" if args.flash_stream == "off" else args.flash_stream)

    if args.cpu:
        # --cpu --mesh d,f,t: virtual multi-device host platform so the
        # production sharded program (GSPMD + shard_map losses, XLA inner)
        # preflights without TPU hardware
        ndev = 1
        if args.mesh:
            import math

            ndev = math.prod(int(x) for x in args.mesh.split(","))
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ndev}"
        )
    else:
        # Big kernel blocks: per-program dispatch (~2.7us) dominated the
        # profiled r2 kernels at default blocks (722-program flash grids,
        # 5.6k-program fused-CE backward grids).  The compiler's 16M
        # scoped-VMEM default caps tile sizes; raise it per-compile (see
        # SCOPED_VMEM_OPTS below) and grow the block budgets accordingly.
        os.environ.setdefault("KDSS_FLASH_ROWS", "7168")
        os.environ.setdefault("KDSS_FLASH_BK", "1024")
        os.environ.setdefault("KDSS_FUSED_BN", "512")
        os.environ.setdefault("KDSS_FUSED_BV", "2048")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compilation cache: remote compiles through the axon
        # tunnel take 5-10 min per program and are NOT cached across
        # processes otherwise.
        os.makedirs("/tmp/kdss_jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/kdss_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main() -> None:
    args = build_parser().parse_args()
    setup_env(args)

    results = {}
    if args.mode in ("all", "kd"):
        results["kd"] = bench_train(args, "kd")
    if args.mode in ("all", "baseline_depth"):
        results["baseline_depth"] = bench_train(args, "baseline_depth")
    if args.mode in ("all", "generation"):
        results["generation"] = bench_generation(args)
    if args.mode in ("all", "eval_loop"):
        results["eval_loop"] = bench_eval_loop(args)

    model_tag = "tiny-cpu-smoke" if args.cpu else "0.5B student"
    if args.mode == "eval_loop":
        e = results["eval_loop"]
        print(json.dumps({
            "metric": f"evaluator loop rows/sec ({model_tag}, "
                      f"B={e['batch']}, {e['new_tokens']} new tokens)",
            "value": e["rows_per_sec"], "unit": "rows/s",
            "vs_baseline": None,
            "extras": {"host_frac": e["host_frac"],
                       "device_frac": e["device_frac"]},
        }))
        return
    if "kd" in results:
        head, label = results["kd"], f"kd_double_trouble_p{args.kd_phase}"
        teacher_tag = ("tiny teacher" if args.cpu
                       else "7B teacher" if args.teacher == "7b"
                       else "1.2B teacher")
        if args.teacher_quant != "none":
            eh = args.teacher_embed_quant
            if eh == "auto":
                eh = ("int8"
                      if args.teacher_quant in ("int8", "int8_full")
                      else "none")
            teacher_tag += f" ({args.teacher_quant}"
            teacher_tag += "+eh)" if eh == "int8" else ")"
        detail = f"{teacher_tag}, S={head['seq_len']}, B={head['batch']}"
    elif "baseline_depth" in results:
        head, label = results["baseline_depth"], "baseline_depth"
        detail = f"S={head['seq_len']}, B={head['batch']}"
    else:
        g = results["generation"]
        print(json.dumps({
            "metric": f"greedy decode tok/sec ({model_tag}, "
                      f"prompt={g['prompt_len']})",
            "value": g["tok_per_sec"], "unit": "tok/s",
            "vs_baseline": None,
        }))
        return

    extras = {}
    if "baseline_depth" in results and label != "baseline_depth":
        extras["baseline_depth_samples_per_sec"] = (
            results["baseline_depth"]["samples_per_sec"]
        )
    if "generation" in results:
        extras["generation_tok_per_sec"] = results["generation"]["tok_per_sec"]
        extras["generation_ms_per_call"] = results["generation"]["ms_per_call"]
    if "eval_loop" in results:
        extras["eval_loop_rows_per_sec"] = (
            results["eval_loop"]["rows_per_sec"])
        extras["eval_loop_host_frac"] = results["eval_loop"]["host_frac"]

    print(json.dumps({
        "metric": f"{label} train samples/sec ({model_tag}, {detail}, 1 chip)",
        "value": head["samples_per_sec"],
        "unit": "samples/s",
        "vs_baseline": round(
            head["samples_per_sec"]
            / head.get("ref_est_samples_per_sec", REF_A100_SAMPLES_PER_SEC),
            4,
        ),
        "ref_est_samples_per_sec": head.get("ref_est_samples_per_sec"),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
