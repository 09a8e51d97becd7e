"""Convert a local HF LLaVA-OneVision snapshot to an Orbax params
checkpoint (one-time import; afterwards trainers restore the Orbax copy
directly, which is much faster than re-running the layout conversion).

Usage:
  python -m ...cli.convert_weights --hf_snapshot /path/to/llava-0.5b \
      --model_size 0.5b --output checkpoints/student_params
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hf_snapshot", type=str, required=True,
                   help="local dir with *.safetensors shards")
    p.add_argument("--model_size", type=str, default="0.5b",
                   choices=["0.5b", "7b"])
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from ..configs import llava_onevision_0_5b, llava_onevision_7b
    from ..models.convert import load_llava_onevision_params

    cfg = llava_onevision_0_5b() if args.model_size == "0.5b" else llava_onevision_7b()
    params = load_llava_onevision_params(args.hf_snapshot, cfg)
    if args.dtype == "bfloat16":
        params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)

    out = os.path.abspath(args.output)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, {"params": params})
    ckptr.wait_until_finished()
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {n/1e9:.3f}B params -> {out}")


if __name__ == "__main__":
    main()
