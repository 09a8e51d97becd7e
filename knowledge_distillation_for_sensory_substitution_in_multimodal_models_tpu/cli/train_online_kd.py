"""Online KD trainer CLI (flag parity with the reference's per-config
``train_online_kd.py`` scripts, `phase1/train_online_kd.py:62-70`).

The reference has one script per strategy/phase directory; here one CLI
takes ``--kd_mode {logit_based,feature_based,double_trouble}`` and
``--phase {1,2,3}``.  Phase hand-off, lowest-val_loss resume, freeze
schedule and loss composition all match the reference (see train/step.py,
train/optimizer.py, train/checkpoint.py docstrings for the file:line map).

Offline smoke (no dataset/weights/network):
  python -m ...cli.train_online_kd --synthetic_data --cpu --batch_size 2 \
      --max_epochs 1 --accumulate_grad_batches 2
"""

from __future__ import annotations

import argparse
import os
import tempfile

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_reference_flags(p, accum_default=64)
    common.add_tpu_flags(p)
    p.add_argument("--kd_mode", type=str, default="double_trouble",
                   choices=["logit_based", "feature_based", "double_trouble"])
    p.add_argument("--phase", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--root_data_dir", type=str, default=None,
                   help="overrides ROOT_DATA_DIR from .env")
    p.add_argument("--teacher_quant", type=str, default="none",
                   choices=["none", "int8", "int8_full"],
                   help="int8: w8a8 decoder-block matmuls for the frozen "
                   "teacher (2x-rate MXU int8 path + half the weight HBM; "
                   "logit-fidelity tested in tests/test_int8.py)")
    p.add_argument("--loca_faithful_indexing", action="store_true",
                   help="replicate the reference's full-tensor LoCa fancy "
                        "indexing (SURVEY.md §2.5 #3) instead of the "
                        "paper-correct per-position calibration")
    p.add_argument("--mask_prompt_labels", action="store_true",
                   help="supervise ONLY the assistant-answer tokens "
                        "(data/collate.py; correct-semantics variant — the "
                        "reference's OneVision path supervises the full "
                        "sequence incl. the ~95%% image-token positions, "
                        "SURVEY.md §2.5 #4; its Pixtral path masks like "
                        "this)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.load_env()
    common.setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax.training.train_state import TrainState

    from ..configs import TrainConfig, kd_loss_config_for
    from ..data.collate import OneVisionCollator
    from ..data.loader import OneVisionLoader
    from ..models import LlavaOnevision
    from ..parallel import shard_params
    from ..parallel.sharding import shard_batch
    from ..train import KDModels, make_optimizer
    from ..train.checkpoint import CheckpointManager, find_best_checkpoint
    from ..train.loop import run_training

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = root or tempfile.mkdtemp(prefix="kdss_synth_")
        root = (common.ensure_synthetic_daquar(root)
                if args.dataset == "daquar"
                else common.ensure_synthetic_dataset(root))
    if not root:
        raise SystemExit("set ROOT_DATA_DIR (.env) or pass --root_data_dir / --synthetic_data")

    scfg, tcfg = common.model_configs(args)
    attn_impl = common.resolve_attn_impl(args)
    compute_dtype = jnp.float32 if args.cpu else jnp.bfloat16
    remat = not common.is_tiny(args)

    student = LlavaOnevision(scfg, dtype=compute_dtype, remat=remat, attn_impl=attn_impl)
    teacher = LlavaOnevision(
        tcfg, dtype=compute_dtype, remat=remat, attn_impl=attn_impl,
        lm_quant="int8" if args.teacher_quant != "none" else "none",
        vision_quant="int8" if args.teacher_quant == "int8_full" else "none",
    )

    tok = common.make_tokenizer(args, scfg)
    buckets = (256,) if common.is_tiny(args) else None
    collator_kw = dict(buckets=buckets) if buckets else {}
    if args.mask_prompt_labels:
        collator_kw["mask_prompt_labels"] = True
    train_ds, val_ds = common.make_datasets(args, root)
    train_loader = OneVisionLoader(
        train_ds, OneVisionCollator(scfg, tok, **collator_kw),
        batch_size=args.batch_size, accum=args.accumulate_grad_batches,
        shuffle=True, seed=args.seed, num_workers=args.num_workers,
        drop_ragged=False,
    )
    val_loader = OneVisionLoader(
        val_ds, OneVisionCollator(scfg, tok, **collator_kw),
        batch_size=args.batch_size, accum=1, shuffle=False,
        num_workers=args.num_workers, drop_ragged=False,
    )

    sparams = common.init_or_load_params(student, scfg, args.student_weights, args.seed)
    # Teacher weights are loaded/initialized in bf16 and quantized once
    # here — checkpoints stay quantization-agnostic.
    bf16_teacher = (teacher if args.teacher_quant == "none"
                    else LlavaOnevision(tcfg, dtype=compute_dtype))
    tparams = common.init_or_load_params(bf16_teacher, tcfg, args.teacher_weights, args.seed + 1)
    if args.teacher_quant != "none":
        import functools as _ft

        from ..ops.int8 import quantize_lm_params_int8

        tparams = jax.jit(_ft.partial(
            quantize_lm_params_int8,
            include_vision=args.teacher_quant == "int8_full",
        ))(tparams)

    loss_cfg = kd_loss_config_for(args.kd_mode)
    if args.loca_faithful_indexing:
        import dataclasses

        loss_cfg = dataclasses.replace(loss_cfg, loca_faithful_indexing=True)
    cfg = TrainConfig(
        batch_size=args.batch_size, max_epochs=args.max_epochs,
        subset_percentage=args.subset_percentage,
        load_checkpoint=args.load_checkpoint, augmentation=args.augmentation,
        accumulate_grad_batches=args.accumulate_grad_batches,
        learning_rate=args.learning_rate, kd_mode=args.kd_mode,
        phase=args.phase, loss=loss_cfg,
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
    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        sparams, cfg.learning_rate, cosine_t_max=cfg.cosine_t_max,
        steps_per_epoch=steps_per_epoch, kd_mode=cfg.kd_mode, phase=cfg.phase,
    )

    ckpt_dir = os.path.join(args.checkpoint_dir, f"kd_{args.kd_mode}_phase{args.phase}")

    # Phase hand-off (`phase2/train_online_kd.py:88`): a fresh phase N>1 run
    # initializes the student from phase N-1's best checkpoint.
    if (
        args.kd_mode == "double_trouble" and args.phase > 1
        and not args.load_checkpoint
    ):
        prev_dir = os.path.join(
            args.checkpoint_dir, f"kd_{args.kd_mode}_phase{args.phase - 1}"
        )
        prev = find_best_checkpoint(prev_dir)
        if prev is not None:
            mgr = CheckpointManager(prev_dir)
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
                {"params": sparams},
            )
            sparams = mgr.restore(prev, abstract, partial=True)["params"]
            print(f"phase hand-off: initialized from {prev}")

    state_tpl = TrainState.create(apply_fn=None, params=sparams, tx=tx)
    if args.load_checkpoint:
        mgr = CheckpointManager(ckpt_dir)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            {"params": state_tpl.params, "opt_state": state_tpl.opt_state,
             "step": np.asarray(0)},
        )
        restored, path = mgr.restore_best(abstract)
        if restored is not None:
            print(f"resumed from {path}")
            state_tpl = state_tpl.replace(
                params=restored["params"], opt_state=restored["opt_state"],
                step=int(restored["step"]),
            )

    ctx = jax.set_mesh(mesh) if multi else _nullcontext()
    with ctx:
        if multi:
            state_tpl = state_tpl.replace(params=shard_params(state_tpl.params, mesh))
            tparams = shard_params(tparams, mesh)
            put = lambda b: shard_batch(b, mesh)  # noqa: E731
        else:
            put = None
        run_name = (
            f"kd_{args.kd_mode}_phase{args.phase}_batch{args.batch_size}"
            f"_epochs{args.max_epochs}_grad_accum{args.accumulate_grad_batches}"
            f"_{'aug' if args.augmentation else 'noaug'}"
        )
        run_training(
            KDModels(student, teacher), cfg, state_tpl, tparams,
            train_loader, val_loader,
            ckpt_dir=ckpt_dir, tb_logdir=args.tensorboard_dir,
            run_name=run_name, shard_batch_fn=put,
            profile_dir=args.profile_dir,
                compiler_options=common.tpu_compiler_options(args),
        )
    print("training complete")


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
