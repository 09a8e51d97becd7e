"""Baseline fine-tune CLI (parity with `distillation/baseline_depth/train.py`
and `baseline_rgb05b/train.py`): one 0.5B student, masked-CE loss, the
pixel stream selected by ``--pixel_stream {depth,rgb}``.

This is BASELINE.json config #1 ("baseline_depth ... CPU-runnable PR1"):
  python -m ...cli.train --synthetic_data --cpu --batch_size 1 \
      --max_epochs 1 --subset_percentage 0.01
"""

from __future__ import annotations

import argparse
import os
import tempfile

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_reference_flags(p, accum_default=32)
    common.add_tpu_flags(p)
    p.add_argument("--pixel_stream", type=str, default="depth",
                   choices=["depth", "rgb"])
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--root_data_dir", type=str, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.load_env()
    common.setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.training.train_state import TrainState

    from ..configs import TrainConfig
    from ..data.collate import OneVisionCollator
    from ..data.loader import OneVisionLoader
    from ..models import LlavaOnevision
    from ..parallel import shard_params
    from ..parallel.sharding import shard_batch
    from ..train import KDModels, make_optimizer
    from ..train.checkpoint import CheckpointManager
    from ..train.loop import run_training

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = root or tempfile.mkdtemp(prefix="kdss_synth_")
        root = (common.ensure_synthetic_daquar(root)
                if args.dataset == "daquar"
                else common.ensure_synthetic_dataset(root))
    if not root:
        raise SystemExit("set ROOT_DATA_DIR (.env) or pass --root_data_dir / --synthetic_data")

    scfg, _ = common.model_configs(args)
    attn_impl = common.resolve_attn_impl(args)
    compute_dtype = jnp.float32 if args.cpu else jnp.bfloat16
    remat = not common.is_tiny(args)
    student = LlavaOnevision(scfg, dtype=compute_dtype, remat=remat, attn_impl=attn_impl)

    tok = common.make_tokenizer(args, scfg)
    buckets = (256,) if common.is_tiny(args) else None
    collator_kw = dict(buckets=buckets) if buckets else {}

    class StreamCollator(OneVisionCollator):
        """Route the chosen pixel stream into the student_* keys (the
        reference's three LLavaOneVisionModule copies differ only in this,
        SURVEY.md §2.3 "Baseline Lightning module")."""

        def __call__(self, samples):
            batch = super().__call__(samples)
            if args.pixel_stream == "rgb":
                batch["student_pixel_values"] = batch["teacher_pixel_values"]
            for k in ("teacher_input_ids", "teacher_attention_mask",
                      "teacher_pixel_values"):
                batch.pop(k)
            return batch

    train_ds, val_ds = common.make_datasets(args, root)
    train_loader = OneVisionLoader(
        train_ds, StreamCollator(scfg, tok, **collator_kw),
        batch_size=args.batch_size, accum=args.accumulate_grad_batches,
        shuffle=True, seed=args.seed, num_workers=args.num_workers,
        drop_ragged=False,
    )
    val_loader = OneVisionLoader(
        val_ds, StreamCollator(scfg, tok, **collator_kw),
        batch_size=args.batch_size, accum=1, shuffle=False,
        num_workers=args.num_workers, drop_ragged=False,
    )

    sparams = common.init_or_load_params(student, scfg, args.student_weights, args.seed)
    cfg = TrainConfig(
        batch_size=args.batch_size, max_epochs=args.max_epochs,
        subset_percentage=args.subset_percentage,
        load_checkpoint=args.load_checkpoint, augmentation=args.augmentation,
        accumulate_grad_batches=args.accumulate_grad_batches,
        learning_rate=args.learning_rate, kd_mode="baseline",
        pixel_stream=args.pixel_stream, cosine_t_max=0,
        loss_chunk_size=32 if common.is_tiny(args) else 256,
        # fused Pallas CE/KL kernels on single-chip TPU (15% step speedup
        # measured); chunked XLA path on CPU/tiny/multi-chip runs (GSPMD
        # cannot partition Pallas custom calls yet)
        ce_impl=(
            "fused"
            if not (args.cpu or common.is_tiny(args))
            and __import__("jax").device_count() == 1
            else "chunked"
        ),
    )

    mesh = common.build_mesh(args)
    multi = mesh.devices.size > 1
    tx = make_optimizer(sparams, cfg.learning_rate)
    state = TrainState.create(apply_fn=None, params=sparams, tx=tx)

    ckpt_dir = os.path.join(args.checkpoint_dir, f"baseline_{args.pixel_stream}")
    if args.load_checkpoint:
        mgr = CheckpointManager(ckpt_dir)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            {"params": state.params, "opt_state": state.opt_state,
             "step": np.asarray(0)},
        )
        restored, path = mgr.restore_best(abstract)
        if restored is not None:
            print(f"resumed from {path}")
            state = state.replace(
                params=restored["params"], opt_state=restored["opt_state"],
                step=int(restored["step"]),
            )

    if multi:
        with jax.set_mesh(mesh):
            state = state.replace(params=shard_params(state.params, mesh))
            run_training(
                KDModels(student, None), cfg, state, None,
                train_loader, val_loader, ckpt_dir=ckpt_dir,
                tb_logdir=args.tensorboard_dir,
                run_name=f"baseline_{args.pixel_stream}",
                shard_batch_fn=lambda b: shard_batch(b, mesh),
                profile_dir=args.profile_dir,
                compiler_options=common.tpu_compiler_options(args),
            )
    else:
        run_training(
            KDModels(student, None), cfg, state, None,
            train_loader, val_loader, ckpt_dir=ckpt_dir,
            tb_logdir=args.tensorboard_dir,
            run_name=f"baseline_{args.pixel_stream}",
            profile_dir=args.profile_dir,
                compiler_options=common.tpu_compiler_options(args),
        )
    print("training complete")


if __name__ == "__main__":
    main()
