"""Shared CLI plumbing: .env loading, argparse base flags, model/param
construction, synthetic-data fallback.

The reference reads ``ROOT_DATA_DIR`` / ``MAIN_ROOT_DATA_DIR`` / ``hf_token``
from a ``.env`` via python-dotenv (`phase1/train_online_kd.py:28-41`,
`README.md:63-69`); here a dependency-free parser covers the same format.
Every trainer accepts the reference's six flags verbatim
(`phase1/train_online_kd.py:62-70`) plus TPU-specific extensions
(mesh shape, dtypes, tokenizer/weights paths, --synthetic_data for
offline smoke runs, --cpu to force the host platform).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np


def load_env(path: str = ".env") -> dict:
    env = {}
    if os.path.exists(path):
        for line in open(path):
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            env[k.strip()] = v.strip().strip("'\"")
            os.environ.setdefault(k.strip(), env[k.strip()])
    return env


def add_reference_flags(p: argparse.ArgumentParser, accum_default: int = 64):
    """The six reference CLI flags (`phase1/train_online_kd.py:65-70`)."""
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_epochs", type=int, default=1)
    p.add_argument("--subset_percentage", type=float, default=None)
    p.add_argument("--load_checkpoint", action="store_true")
    p.add_argument("--augmentation", action="store_true")
    p.add_argument("--accumulate_grad_batches", type=int, default=accum_default)


def add_tpu_flags(p: argparse.ArgumentParser):
    p.add_argument("--cpu", action="store_true", help="force CPU platform")
    p.add_argument("--distributed", action="store_true",
                   help="jax.distributed.initialize() for multi-host pods")
    p.add_argument("--synthetic_data", action="store_true",
                   help="generate a tiny on-disk SUNRGBD tree + hash tokenizer "
                        "(no real dataset/weights needed)")
    p.add_argument("--real_model", action="store_true",
                   help="use the real 0.5B/7B configs even with "
                        "--synthetic_data (real-scale TPU drives)")
    p.add_argument("--tiny_model", action="store_true",
                   help="tiny configs (CI/smoke); default with --synthetic_data")
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--student_weights", type=str, default=None,
                   help="local HF snapshot dir for the 0.5B student")
    p.add_argument("--teacher_weights", type=str, default=None,
                   help="local HF snapshot dir for the 7B teacher")
    p.add_argument("--mesh", type=str, default=None,
                   help="data,fsdp,tensor (default: all devices on tensor)")
    p.add_argument("--attn_impl", type=str, default=None,
                   choices=["xla", "pallas", "pallas_spmd", "xla_chunked"],
                   help="default: pallas on TPU, xla on CPU")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--tensorboard_dir", type=str, default="tensorboard_logs")
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    # 1D-depth variant (reference `...1DDepth.py`: grayscale x3 encoding,
    # `*_dataset3.csv` split files)
    p.add_argument("--depth_encoding", type=str, default="prewitt",
                   choices=["prewitt", "gray3", "prewitt_imagenet"])
    p.add_argument("--train_csv", type=str, default="train_dataset.csv")
    p.add_argument("--val_csv", type=str, default="val_dataset.csv")
    # DAQUAR variant (reference `DAQUARDatasetOneVision.py` +
    # `DAQUAROneVisionDataModule.py`: images/<n>.png + depth/<n>_depth.png)
    p.add_argument("--dataset", type=str, default="sunrgbd",
                   choices=["sunrgbd", "daquar"])


# Raised scoped-VMEM limit for the big-block Pallas kernels (TPU-compiler
# flag: NOT legal in client XLA_FLAGS; must go through jit
# compiler_options, which the runtime forwards per-compile).
SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "98304"}


def tpu_compiler_options(args):
    """compiler_options for train-step jits (None on CPU)."""
    return None if getattr(args, "cpu", False) else dict(SCOPED_VMEM_OPTS)


def backend_compiler_options():
    """Same, keyed off the active backend (for helpers without args)."""
    import jax

    try:
        if jax.default_backend() != "cpu":
            return dict(SCOPED_VMEM_OPTS)
    except Exception:
        pass
    return None


def setup_platform(args) -> None:
    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
    else:
        # big-block kernel budgets (docs/PERF_NOTES.md round 2); paired
        # with the raised scoped-VMEM limit in tpu_compiler_options()
        os.environ.setdefault("KDSS_FLASH_ROWS", "7168")
        os.environ.setdefault("KDSS_FLASH_BK", "1024")
        os.environ.setdefault("KDSS_FUSED_BN", "512")
        os.environ.setdefault("KDSS_FUSED_BV", "2048")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compilation cache: remote compiles through the axon
        # tunnel take minutes per program and are not cached across
        # processes otherwise.
        os.makedirs("/tmp/kdss_jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", "/tmp/kdss_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    if getattr(args, "distributed", False):
        # Multi-host TPU pods (SURVEY.md §5 "distributed comm backend"):
        # coordinator/process env comes from the TPU runtime; the mesh then
        # spans all processes' devices (DCN axis for multi-slice).
        jax.distributed.initialize()


def resolve_attn_impl(args) -> str:
    if args.attn_impl:
        return args.attn_impl
    import jax

    if len(jax.devices()) > 1:
        # GSPMD cannot partition Pallas custom calls; multi-chip TPU
        # meshes use the shard_map flash wrapper (batch over data/fsdp,
        # heads over tensor — ops/flash_attention.py::flash_attention_spmd).
        # Virtual CPU meshes fall back to XLA attention: interpret-mode
        # Pallas hangs inside shard_map on the CPU backend.
        if jax.devices()[0].platform == "tpu":
            return "pallas_spmd"
        return "xla"
    return "pallas" if jax.devices()[0].platform == "tpu" else "xla"


def build_mesh(args):
    import jax

    from ..parallel import MeshConfig, make_mesh

    n = len(jax.devices())
    if args.mesh:
        d, f, t = (int(x) for x in args.mesh.split(","))
        mc = MeshConfig(d, f, t)
    elif n == 1:
        mc = MeshConfig(1, 1, 1)
    else:
        mc = MeshConfig.for_devices(n)
    return make_mesh(mc)


def is_tiny(args) -> bool:
    """Tiny-config mode: smoke/synthetic runs unless --real_model."""
    return (args.synthetic_data or args.tiny_model) and not getattr(
        args, "real_model", False
    )


def model_configs(args) -> Tuple:
    from ..configs import (
        llava_onevision_0_5b,
        llava_onevision_7b,
        llava_onevision_tiny,
        llava_onevision_tiny_teacher,
    )

    if is_tiny(args):
        return llava_onevision_tiny(), llava_onevision_tiny_teacher()
    return llava_onevision_0_5b(), llava_onevision_7b()


def make_tokenizer(args, cfg):
    from ..data.tokenization import HashTokenizer, get_tokenizer

    if args.tokenizer_path:
        return get_tokenizer(args.tokenizer_path)
    tok = HashTokenizer(
        vocab_size=cfg.text.vocab_size,
        pad_token_id=cfg.pad_token_id,
        eos_token_id=cfg.eos_token_id,
        image_token_id=cfg.image_token_id,
    )
    if cfg.text.vocab_size < 152_000:
        # tiny config: squash special ids into the small vocab
        tok.SPECIALS = {
            "<|im_start|>": cfg.text.vocab_size - 6,
            "<|im_end|>": cfg.pad_token_id,
            "<image>": cfg.image_token_id,
            "<video>": cfg.video_token_id,
        }
        import hashlib

        vocab = cfg.text.vocab_size

        def _wid(w, _tok=tok, _vocab=vocab):
            if w in _tok.SPECIALS:
                return _tok.SPECIALS[w]
            wid = _tok._cache.get(w)
            if wid is None:
                h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "big")
                wid = h % (_vocab - 8)
                # keep the reverse map populated (HashTokenizer._word_id
                # does) so decode() can render seen words — the e2e
                # learning test reads predictions back as text
                _tok._cache[w] = wid
                _tok._rev.setdefault(wid, w)
            return wid

        tok._word_id = _wid
    return tok


def init_or_load_params(model, cfg, weights_path: Optional[str], seed: int,
                        batch_example=None):
    """Convert a local HF snapshot, or random-init (synthetic mode)."""
    import jax
    import jax.numpy as jnp

    if weights_path:
        from ..models.convert import load_llava_onevision_params

        return load_llava_onevision_params(weights_path, cfg)

    from ..utils.synthetic import synthetic_kd_batch

    ex = batch_example
    if ex is None:
        try:
            ex = synthetic_kd_batch(cfg, 1, 96, seed=seed)
        except ValueError:
            # real-scale configs: the default init image needs ~1.3k tokens
            ex = synthetic_kd_batch(cfg, 1, 2048, seed=seed)
        ex = jax.tree.map(jnp.asarray, ex)
    # jit the init: eager dispatch would run the flash pallas_calls
    # through their implicit jit WITHOUT the raised scoped-VMEM limit
    init = jax.jit(
        lambda key: model.init(
            key,
            input_ids=ex["student_input_ids"],
            attention_mask=ex["student_attention_mask"],
            pixel_values=ex["student_pixel_values"],
            pack_idx=ex["pack_idx"],
            pack_weight=ex["pack_weight"],
            pack_valid=ex["pack_valid"],
            tile_valid=ex["tile_valid"],
        )["params"],
        compiler_options=backend_compiler_options(),
    )
    return init(jax.random.PRNGKey(seed))


def ensure_synthetic_dataset(root: str, n: int = 12, seed: int = 0,
                             size=None) -> str:
    """Materialize a tiny SUNRGBD-layout tree (csv_data + images).

    ``size=(h, w)`` pins every image to one resolution — the eval-loop
    bench uses the production SUNRGBD 530x730 so the host depth/anyres
    work and the compiled prompt shapes match the real workload."""
    import pandas as pd
    from PIL import Image

    sun = os.path.join(root, "SUNRGBD")
    os.makedirs(os.path.join(sun, "csv_data"), exist_ok=True)
    os.makedirs(os.path.join(sun, "img"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    answers = ["chair", "table", "bed", "two", "yes", "red"]
    qtypes = [
        "Object Identification", "Object Identification", "Object Identification",
        "Count", "Yes/No", "Color",
    ]
    for i in range(n):
        h, w = size if size is not None else [(45, 67), (30, 80), (52, 52)][i % 3]
        rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        depth = rng.integers(0, 65535, size=(h, w)).astype(np.uint16)
        Image.fromarray(rgb).save(os.path.join(sun, "img", f"rgb_{i}.png"))
        Image.fromarray(depth).save(os.path.join(sun, "img", f"d_{i}.png"))
        rows.append({
            "Question_Id": i,
            "Questions": f"what is the object number {i}?",
            "Answers": answers[i % len(answers)],
            "Image_Path": f"SUNRGBD/img/rgb_{i}.png",
            "Depth_Path": f"SUNRGBD/img/d_{i}.png",
            "Question_Type": qtypes[i % len(qtypes)],
        })
    df = pd.DataFrame(rows)
    for split in ("train_dataset.csv", "val_dataset.csv", "test_dataset.csv"):
        df.to_csv(os.path.join(sun, "csv_data", split), index=False)
    return root


def ensure_synthetic_daquar(root: str, n: int = 8, seed: int = 0) -> str:
    """Tiny DAQUAR-layout tree: images/<name>.png + depth/<name>_depth.png
    (`DAQUARDatasetOneVision.py:119-135`)."""
    import pandas as pd
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = [(48, 64), (40, 56)][i % 2]
        name = f"image{i}"
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        ).save(os.path.join(root, "images", f"{name}.png"))
        Image.fromarray(
            rng.integers(0, 65535, (h, w)).astype(np.uint16)
        ).save(os.path.join(root, "depth", f"{name}_depth.png"))
        rows.append({
            "Question_Id": i,
            "Questions": f"what is in the image {i}?",
            "Answers": ["chair", "table"][i % 2],
            "Image_Path": f"{name}.png",
            "Depth_Path": f"{name}_depth.png",
        })
    df = pd.DataFrame(rows)
    for split in ("train_dataset.csv", "val_dataset.csv", "test_dataset.csv"):
        df.to_csv(os.path.join(root, split), index=False)
    return root


def make_datasets(args, root):
    """(train_ds, val_ds) for --dataset sunrgbd|daquar."""
    from ..data.dataset import DAQUARVQADataset, SUNRGBDVQADataset

    if args.dataset == "daquar":
        return (
            DAQUARVQADataset(root, args.train_csv, args.subset_percentage),
            DAQUARVQADataset(root, args.val_csv, args.subset_percentage),
        )
    return (
        SUNRGBDVQADataset(root, args.train_csv, args.subset_percentage,
                          depth_encoding=args.depth_encoding),
        SUNRGBDVQADataset(root, args.val_csv, args.subset_percentage,
                          depth_encoding=args.depth_encoding),
    )
