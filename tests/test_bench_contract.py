"""bench.py driver contract: one parseable JSON line with the required
keys, on the CPU smoke config."""

import json
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _run(args):
    out = subprocess.run(
        [sys.executable, "bench.py", "--cpu", "--steps", "2", *args],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def test_bench_single_mode_json():
    j = _run(["--mode", "baseline_depth"])
    assert set(j) >= {"metric", "value", "unit", "vs_baseline"}
    assert j["unit"] == "samples/s" and j["value"] > 0


def test_bench_suite_json():
    j = _run([])
    assert j["metric"].startswith("kd_double_trouble_p")
    assert "baseline_depth_samples_per_sec" in j["extras"]
    assert "generation_tok_per_sec" in j["extras"]


def test_bench_quant_flags_json():
    # auto embed-quant resolves to int8 for any int8 teacher (r3 default)
    j = _run(["--mode", "kd", "--teacher_quant", "int8"])
    assert "(int8+eh)" in j["metric"] and j["value"] > 0
    j = _run(["--mode", "kd", "--teacher_quant", "int8",
              "--teacher_embed_quant", "none"])
    assert "(int8)" in j["metric"] and j["value"] > 0
    g = _run(["--mode", "generation", "--student_quant", "int8"])
    assert g["unit"] == "tok/s" and g["value"] > 0


def test_bench_accum_json():
    # --accum N scans N micro-batches inside the jit step (the reference's
    # accumulate_grad_batches); samples/s counts steps*batch*accum.
    j = _run(["--mode", "kd", "--accum", "2"])
    assert j["value"] > 0


def test_bench_remat_policy_json():
    # "dots"/"flash" remat granularities must produce a valid run (flash
    # names only bind when the pallas kernels are active — on CPU this
    # degenerates to full remat, which is the point of the contract: the
    # flag is accepted and the program still trains).
    j = _run(["--mode", "kd", "--remat_policy", "dots"])
    assert j["value"] > 0


def test_materialize_quantized_matches_quantize_layout():
    # bench --teacher 7b materializes the teacher DIRECTLY in its
    # quantized layout (the full-precision 7B intermediate would fill the
    # chip); the generated tree must match what quantize_lm_params_int8
    # would produce — same treedef/shapes/dtypes — with valid values
    # (int8 kernels in [-127, 127], strictly positive dequant scales).
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    import bench
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.ops.int8 import (
        quantize_lm_params_int8,
    )

    bf16 = jnp.bfloat16
    params = {
        "language_model": {
            "embed_tokens": {"embedding": jnp.ones((64, 16), bf16)},
            "layers_0": {
                "self_attn": {
                    "q_proj": {"kernel": jnp.ones((16, 16), bf16),
                               "bias": jnp.ones((16,), bf16)},
                },
                "mlp": {"up_proj": {"kernel": jnp.ones((16, 32), bf16)}},
                "input_layernorm": {"scale": jnp.ones((16,), bf16)},
            },
        },
        "vision_tower": {
            "layers_0": {"mlp": {"fc1": {"kernel": jnp.ones((8, 8), bf16)}}},
        },
    }
    quantize = lambda t: quantize_lm_params_int8(t, include_vision=True)
    qshapes = jax.eval_shape(quantize, params)
    got = bench._materialize_quantized(qshapes, 0)

    ref_paths, ref_def = jax.tree_util.tree_flatten_with_path(
        jax.jit(quantize)(params))
    got_paths, got_def = jax.tree_util.tree_flatten_with_path(got)
    assert ref_def == got_def
    for (pr, lr), (pg, lg) in zip(ref_paths, got_paths):
        assert pr == pg and lr.shape == lg.shape and lr.dtype == lg.dtype
        name = jax.tree_util.keystr(pg)
        if jnp.issubdtype(lg.dtype, jnp.integer):
            assert int(lg.min()) >= -127 and int(lg.max()) <= 127
        elif "kernel_scale" in name:
            assert float(lg.min()) > 0
        assert bool(jnp.all(jnp.isfinite(lg.astype(jnp.float32))))
