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
    j = _run(["--mode", "kd", "--teacher_quant", "int8"])
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
