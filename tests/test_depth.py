"""Golden tests for the Prewitt depth->3ch encoding against scipy semantics
(the reference implementation uses scipy.ndimage.convolve, mode='reflect')."""

import numpy as np
import pytest
from scipy.ndimage import convolve

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.depth import (
    depth_to_3ch_numpy,
    depth_to_3ch_jax,
    depth_to_gray3_numpy,
)


def _reference_encode(depth: np.ndarray) -> np.ndarray:
    """Independent re-derivation of the reference algorithm using scipy."""
    kx = np.array([[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]], dtype=np.float32)
    ky = np.array([[-1, -1, -1], [0, 0, 0], [1, 1, 1]], dtype=np.float32)

    def safe_norm(a):
        lo, hi = a.min(), a.max()
        if hi == lo:
            hi = lo + 1e-6
        return 255.0 * (a - lo) / (hi - lo)

    d = depth.astype(np.float32)
    lo, hi = d.min(), d.max()
    if hi == lo:
        hi = lo + 1e-6
    dn = (255.0 * (d - lo) / (hi - lo)).astype(np.uint8)
    gx = convolve(dn.astype(np.float32), kx, mode="reflect")
    gy = convolve(dn.astype(np.float32), ky, mode="reflect")
    gm = np.sqrt(gx**2 + gy**2)
    gt = np.arctan2(gy, gx)
    return np.dstack([dn, safe_norm(gm).astype(np.uint8), safe_norm(gt).astype(np.uint8)])


@pytest.mark.parametrize("shape", [(17, 23), (64, 48), (5, 5)])
def test_numpy_matches_scipy(shape):
    rng = np.random.default_rng(0)
    depth = rng.integers(0, 65535, size=shape).astype(np.int32)
    expected = _reference_encode(depth)
    got = depth_to_3ch_numpy(depth)
    np.testing.assert_array_equal(got, expected)


def test_constant_depth_no_nan():
    depth = np.full((16, 16), 1234, dtype=np.int32)
    out = depth_to_3ch_numpy(depth)
    assert out.dtype == np.uint8
    assert out.shape == (16, 16, 3)
    assert np.all(out[..., 0] == 0)


def test_jax_matches_numpy():
    rng = np.random.default_rng(1)
    depth = rng.integers(0, 8000, size=(33, 41)).astype(np.int32)
    expected = depth_to_3ch_numpy(depth)
    got = np.asarray(depth_to_3ch_jax(depth))
    # uint8 rounding in float32 vs float64 paths can differ by 1 LSB on
    # normalization boundaries; require exactness on depth and <=1 LSB on
    # gradient channels.
    np.testing.assert_array_equal(got[..., 0], expected[..., 0])
    assert np.max(np.abs(got.astype(int) - expected.astype(int))) <= 1


def test_imagenet_bake_changes_output():
    rng = np.random.default_rng(2)
    depth = rng.integers(0, 5000, size=(24, 24)).astype(np.int32)
    plain = depth_to_3ch_numpy(depth)
    baked = depth_to_3ch_numpy(depth, imagenet_bake=True)
    assert plain.shape == baked.shape
    assert not np.array_equal(plain, baked)


def test_gray3_variant():
    rng = np.random.default_rng(3)
    depth = rng.integers(0, 100, size=(10, 12)).astype(np.int32)
    out = depth_to_gray3_numpy(depth)
    assert out.shape == (10, 12, 3)
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])
