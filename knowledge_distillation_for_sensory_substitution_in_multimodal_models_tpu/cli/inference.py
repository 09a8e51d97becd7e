"""Single-sample inference demo (parity with `inference/inference.py:30-114`):
load a checkpoint, encode one depth image, generate one answer, print a
one-row DataFrame.

Offline smoke:
  python -m ...cli.inference --synthetic_data --cpu --row 0
"""

from __future__ import annotations

import argparse
import os
import tempfile

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--row", type=int, default=0, help="dataset row to run")
    p.add_argument("--gts_type", type=str, default="val")
    p.add_argument("--student_ckpt_path", type=str, default=None)
    p.add_argument("--pixel_data_type", type=str, default="depth",
                   choices=["depth", "rgb"])
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--root_data_dir", type=str, default=None)
    p.add_argument("--quant", type=str, default="none",
                   choices=["none", "int8", "int8_full"],
                   help="int8: w8a8 LM decoder matmuls for serving "
                   "(ops/int8.py)")
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
    from ..models import LlavaOnevision
    from ..train.checkpoint import CheckpointManager
    from ..utils.numwords import digits_to_words

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = common.ensure_synthetic_dataset(root or tempfile.mkdtemp(prefix="kdss_synth_"))
    if not root:
        raise SystemExit("set ROOT_DATA_DIR or pass --root_data_dir / --synthetic_data")

    scfg, _ = common.model_configs(args)
    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    student = LlavaOnevision(scfg, dtype=dtype, attn_impl=common.resolve_attn_impl(args))
    tok = common.make_tokenizer(args, scfg)
    params = common.init_or_load_params(student, scfg, args.student_weights, args.seed)
    if args.student_ckpt_path:
        mgr = CheckpointManager(os.path.dirname(args.student_ckpt_path))
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), {"params": params}
        )
        params = mgr.restore(args.student_ckpt_path, abstract, partial=True)["params"]

    if args.quant != "none":
        from ..ops.int8 import quant_impl, quantize_lm_params_int8

        import functools as _ft

        params = jax.jit(_ft.partial(
            quantize_lm_params_int8,
            include_vision=args.quant == "int8_full",
        ))(params)
        attn_impl = common.resolve_attn_impl(args)
        q8 = quant_impl(gspmd=attn_impl == "pallas_spmd")
        student = LlavaOnevision(
            scfg, dtype=dtype, attn_impl=attn_impl,
            lm_quant=q8,
            vision_quant=q8 if args.quant == "int8_full" else "none",
        )

    ds = SUNRGBDVQADataset(
        root, f"{args.gts_type}_dataset.csv",
        depth_encoding="prewitt_imagenet",
    )
    sample = ds[args.row]
    buckets = (256,) if common.is_tiny(args) else None
    collator = OneVisionCollator(
        scfg, tok, eval_mode=True, **(dict(buckets=buckets) if buckets else {})
    )
    batch = collator([sample])
    if args.pixel_data_type == "rgb":
        batch["student_pixel_values"] = batch["teacher_pixel_values"]
    jb = {k: jnp.asarray(v) for k, v in batch.items()
          if not k.startswith("teacher_") and k != "question_id"}

    gen = Generator(student, scfg, GenerateConfig(
        max_new_tokens=args.max_new_tokens, eos_token_id=scfg.eos_token_id))
    out = gen.generate(params, jb)
    seqs, plens = np.asarray(out["sequences"]), np.asarray(out["prompt_lengths"])
    valid = np.asarray(out["valid"])
    gen_ids = [int(t) for t, v in zip(seqs[0, plens[0]:], valid[0, plens[0]:]) if v]
    if gen_ids and gen_ids[-1] == scfg.eos_token_id:
        gen_ids = gen_ids[:-1]
    answer = digits_to_words(tok.decode(gen_ids).strip()).lower()

    print(pd.DataFrame([{
        "Question": sample[0],
        "Ground_Truth": sample[1],
        "Model_Answer": answer,
    }]).to_string(index=False))


if __name__ == "__main__":
    main()
