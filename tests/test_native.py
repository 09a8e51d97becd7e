"""Native C++ Prewitt encoder: bit-exactness vs the numpy golden version."""

import subprocess
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    so = os.path.join(REPO, "native", "libdepthops.so")
    if not os.path.exists(so):
        subprocess.run(["sh", os.path.join(REPO, "native", "build.sh")],
                       check=True, capture_output=True)


def test_native_bit_exact():
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.depth import (
        depth_to_3ch_numpy,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.native import (
        depth_to_3ch_native,
        native_available,
    )

    assert native_available(), "native lib should build in this environment"
    rng = np.random.default_rng(0)
    for shape in [(30, 40), (45, 67), (530, 730)]:
        depth = rng.integers(0, 65535, shape).astype(np.uint16)
        want = depth_to_3ch_numpy(depth)
        got = depth_to_3ch_native(depth)
        np.testing.assert_array_equal(got, want)
    # constant depth edge case
    got = depth_to_3ch_native(np.full((20, 20), 7, np.uint16))
    want = depth_to_3ch_numpy(np.full((20, 20), 7, np.uint16))
    np.testing.assert_array_equal(got, want)


def test_native_speedup():
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.depth import (
        depth_to_3ch_numpy,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.native import (
        depth_to_3ch_native,
    )
    import time

    depth = np.random.default_rng(0).integers(0, 65535, (530, 730)).astype(np.uint16)
    depth_to_3ch_native(depth)  # warm
    t0 = time.time()
    for _ in range(5):
        depth_to_3ch_native(depth)
    native_t = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        depth_to_3ch_numpy(depth)
    numpy_t = time.time() - t0
    # not a hard perf bound (CI noise) — just assert it's not pathological
    assert native_t < numpy_t * 2.0
    print(f"native {native_t*200:.1f}ms vs numpy {numpy_t*200:.1f}ms per frame")


def test_native_bake_bit_exact():
    """The r5 native ImageNet-bake variant vs the numpy eval-quirk path
    (imagenet_bake=True).  Bit-exact wherever the BASE encoding's bytes
    agree; on large random inputs std::atan2 vs numpy arctan2 can differ
    by one ulp, which after the normalize+truncate lands a handful of
    theta-channel bytes off by exactly 1 (seed 7 at 530x730 hits one of
    1.16M elements) — bounded here, strict equality elsewhere."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.native import (
        depth_to_3ch_native,
        native_available,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.depth import (
        depth_to_3ch_numpy,
    )

    if not native_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    for shape in ((31, 47), (45, 67)):
        depth = rng.integers(0, 65535, size=shape).astype(np.uint16)
        want = depth_to_3ch_numpy(depth, imagenet_bake=True)
        got = depth_to_3ch_native(depth, imagenet_bake=True)
        np.testing.assert_array_equal(got, want)
    depth = rng.integers(0, 65535, size=(530, 730)).astype(np.uint16)
    want = depth_to_3ch_numpy(depth, imagenet_bake=True)
    got = depth_to_3ch_native(depth, imagenet_bake=True)
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).sum() <= 8, (
        diff.max(), (diff != 0).sum())
