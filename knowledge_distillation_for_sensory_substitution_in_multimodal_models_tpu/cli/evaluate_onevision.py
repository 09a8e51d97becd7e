"""Evaluator CLI (parity with `evaluation/onevisionv3/evaluate_onevision.py`).

Reference flags (`evaluate_onevision.py:300-307`) kept:
  --model_id --gts_type {val,test} --kd_model_type --phase_no
  --pixel_data_type {depth,rgb} --student_ckpt_path
(the reference hardcodes kd_model_type="double_trouble" and
pixel_data_type="depth" over the CLI values, SURVEY.md §2.3 "Evaluator
quirks"; here the flags are honored).

TPU-native differences: decoding is a jit-compiled batched KV-cache
generator (`eval/decode.py`) instead of a per-row ``model.generate`` loop;
the depth stream reproduces the eval-path ImageNet-bake quirk
(`--eval_depth_quirk`, default on for parity).  Predictions CSV columns
match exactly: Question_Id, Questions, Question_Type, Answers, Model_Answer
(`evaluate_onevision.py:433-439`).
"""

from __future__ import annotations

import argparse
import os
import tempfile

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_id", type=str,
                   default="llava-hf/llava-onevision-qwen2-0.5b-ov-hf")
    p.add_argument("--gts_type", type=str, default="val", choices=["val", "test"])
    p.add_argument("--kd_model_type", type=str, default="double_trouble")
    p.add_argument("--phase_no", type=str, default="3")
    p.add_argument("--pixel_data_type", type=str, default="depth",
                   choices=["depth", "rgb"])
    p.add_argument("--student_ckpt_path", type=str, default=None)
    p.add_argument("--subset_percentage", type=float, default=None)
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--predictions_dir", type=str, default="dataset/predictions")
    p.add_argument("--eval_depth_quirk", action="store_true", default=True)
    p.add_argument("--no_eval_depth_quirk", dest="eval_depth_quirk",
                   action="store_false")
    p.add_argument("--root_data_dir", type=str, default=None)
    p.add_argument("--metric_backend", type=str, default="auto",
                   choices=["auto", "spacy", "hashed"],
                   help="spacy: hard-fail unless spaCy+en_core_web_md is "
                        "importable (reference-exact metrics); hashed: "
                        "force the offline fallback; auto: spaCy when "
                        "available (eval/metrics.py)")
    p.add_argument("--prompt_style", type=str, default="reference",
                   choices=["reference", "train"],
                   help="reference: the paper's eval prompt (assistant\\n "
                   "header + ' Answer in one word if possible.'). train: "
                   "the training template's assistant header verbatim — "
                   "for from-scratch learning validation (a from-scratch "
                   "model has no pretrained knowledge to bridge the "
                   "reference eval template's header shift; see "
                   "data/chat.py::render_train_style_eval_prompt)")
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8", "int8_full"],
                   help="int8: w8a8 LM decoder matmuls for serving — decode "
                   "at batch 1 is weight-bandwidth-bound, int8 halves the "
                   "bytes (ops/int8.py; fidelity tests tests/test_int8.py)")
    common.add_tpu_flags(p)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.load_env()
    common.setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from ..data.collate import OneVisionCollator
    from ..data.dataset import SUNRGBDVQADataset
    from ..eval.decode import GenerateConfig, Generator
    from ..eval.metrics import force_backend
    from ..eval.results import update_summary

    force_backend(args.metric_backend)
    from ..models import LlavaOnevision
    from ..train.checkpoint import CheckpointManager
    from ..utils.numwords import digits_to_words

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = common.ensure_synthetic_dataset(root or tempfile.mkdtemp(prefix="kdss_synth_"))
    if not root:
        raise SystemExit("set ROOT_DATA_DIR or pass --root_data_dir / --synthetic_data")

    scfg, tcfg_full = common.model_configs(args)
    # --model_id selects which architecture to evaluate: the reference's
    # `results_*_7b.csv` runs evaluate the 7B model directly
    if "7b" in args.model_id.lower() and not common.is_tiny(args):
        scfg = tcfg_full
    attn_impl = common.resolve_attn_impl(args)
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    student = LlavaOnevision(scfg, dtype=dtype, attn_impl=attn_impl)
    tok = common.make_tokenizer(args, scfg)

    params = common.init_or_load_params(student, scfg, args.student_weights, args.seed)
    if args.student_ckpt_path:
        mgr = CheckpointManager(os.path.dirname(args.student_ckpt_path))
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            {"params": params},
        )
        # checkpoints store {params, opt_state, step}; restore params only
        full = mgr.restore(
            args.student_ckpt_path,
            {"params": abstract["params"]},
            partial=True,
        )
        params = full["params"]
        print(f"loaded student params from {args.student_ckpt_path}")

    if args.quant != "none":
        # Quantize AFTER restore (checkpoints stay bf16/f32) and swap in
        # the int8-consuming model for generation.
        from ..ops.int8 import quant_impl, quantize_lm_params_int8

        import functools as _ft

        params = jax.jit(_ft.partial(
            quantize_lm_params_int8,
            include_vision=args.quant == "int8_full",
        ))(params)
        q8 = quant_impl(gspmd=attn_impl == "pallas_spmd")
        student = LlavaOnevision(
            scfg, dtype=dtype, attn_impl=attn_impl, lm_quant=q8,
            vision_quant=q8 if args.quant == "int8_full" else "none",
        )

    depth_encoding = (
        "prewitt_imagenet" if args.eval_depth_quirk else "prewitt"
    )
    ds = SUNRGBDVQADataset(
        root, f"{args.gts_type}_dataset.csv", args.subset_percentage,
        depth_encoding=depth_encoding,
    )
    buckets = (256,) if common.is_tiny(args) else None
    collator = OneVisionCollator(
        scfg, tok, eval_mode=True, prompt_style=args.prompt_style,
        **(dict(buckets=buckets) if buckets else {})
    )

    gen = Generator(
        student, scfg,
        GenerateConfig(
            max_new_tokens=args.max_new_tokens,
            eos_token_id=scfg.eos_token_id,
        ),
    )

    # Multi-chip eval: shard the model over the mesh (TP for the 7B);
    # decoding was verified token-exact vs single-device
    # (tests/test_sharding.py::test_sharded_generation_matches_single_device)
    mesh = common.build_mesh(args)
    mesh_ctx = None
    if mesh.devices.size > 1:
        from ..parallel import shard_params

        mesh_ctx = jax.set_mesh(mesh)
        mesh_ctx.__enter__()
        params = shard_params(params, mesh)

    # The offline HashTokenizer can only decode ids whose words it has
    # already encoded (data/tokenization.py `_rev`): seed its reverse map
    # with the ground-truth answer vocabulary so a correctly-predicted
    # answer id decodes back to the word instead of an opaque `<id>`.
    # No-op for HF tokenizers (every id decodes) and for wrong
    # predictions (unseen ids still render as `<id>` and score 0).
    if hasattr(tok, "_rev"):
        answers_col = (ds.df["Answers"] if "Answers" in ds.df.columns
                       else ds.df.iloc[:, 2])
        for a in answers_col.astype(str):
            tok.encode(a)
            tok.encode(a.lower())

    rows = []
    bs = args.eval_batch_size
    df = ds.df
    for start in range(0, len(ds), bs):
        idxs = list(range(start, min(start + bs, len(ds))))
        samples = [ds[i] for i in idxs]
        # Pad the ragged tail batch to the full batch size (repeat the
        # last sample) so every batch hits the same compiled program —
        # a ragged tail would recompile the whole prefill+decode graph
        # for one batch (reference anchor: the per-row loop this replaces,
        # `evaluate_onevision.py:402-443`, had no such concern).
        n_real = len(samples)
        if n_real < bs:
            samples = samples + [samples[-1]] * (bs - n_real)
        batch = collator(samples)
        if args.pixel_data_type == "rgb":
            batch["student_pixel_values"] = batch["teacher_pixel_values"]
        jb = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if not k.startswith("teacher_") and k != "question_id"
        }
        out = gen.generate(params, jb)
        seqs = np.asarray(out["sequences"])[:n_real]
        plens = np.asarray(out["prompt_lengths"])[:n_real]
        valid = np.asarray(out["valid"])[:n_real]
        for j, i in enumerate(idxs):
            gen_ids = [
                int(t) for t, v in zip(seqs[j, plens[j]:], valid[j, plens[j]:]) if v
            ]
            # strip eos
            if gen_ids and gen_ids[-1] == scfg.eos_token_id:
                gen_ids = gen_ids[:-1]
            text = tok.decode(gen_ids).strip()
            answer = digits_to_words(text).lower().strip()
            rows.append({
                "Question_Id": int(df.iloc[i, 0]) if "Question_Id" in df.columns else i,
                "Questions": samples[j][0],
                "Question_Type": df.iloc[i].get("Question_Type", ""),
                "Answers": samples[j][1],
                "Model_Answer": answer,
            })
        if start % (10 * bs) == 0:
            print(f"evaluated {start + len(idxs)}/{len(ds)}", flush=True)

    os.makedirs(args.predictions_dir, exist_ok=True)
    phase = f"phase{args.phase_no}" if args.kd_model_type == "double_trouble" else ""
    fname = (
        f"results_kd_modeltypeL{args.pixel_data_type}_{args.gts_type}_"
        f"{args.kd_model_type}{phase}.csv"
    )
    out_path = os.path.join(args.predictions_dir, fname)
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print("Results saved to:", out_path)

    if mesh_ctx is not None:
        mesh_ctx.__exit__(None, None, None)

    summary = update_summary(args.predictions_dir)
    tail = summary.tail(1).to_dict("records")
    print("summary:", tail)


if __name__ == "__main__":
    main()
