"""Depth -> 3-channel Prewitt encoding.

Reference semantics: ``dataset/dataloader/OneVision/CustomSUNRGBDDatasetOneVision.py:64-112``
(`convert_depth_image_into_3D`): normalize raw depth to uint8 [0,255], run
3x3 Prewitt Gx/Gy with reflect padding, stack
``[depth_norm, |G| norm, atan2(Gy,Gx) norm]`` as uint8 RGB.

Two implementations:

* :func:`depth_to_3ch_numpy` — bit-exact CPU version (golden reference, used
  by the data pipeline workers; matches scipy.ndimage.convolve output).
* :func:`depth_to_3ch_jax` — vectorized jax version for fused on-device
  preprocessing (batched, jit/vmap friendly; conv via lax.reduce_window-free
  shifts so XLA fuses it into the input program).

The eval path additionally bakes ImageNet normalization into the uint8 image
(`evaluation/onevisionv3/evaluate_onevision.py:237-290`); that quirk is
reproduced by ``imagenet_bake=True`` (off by default for the train path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Prewitt kernels, identical to the reference definition.
_KX = np.array([[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]], dtype=np.float32)
_KY = np.array([[-1, -1, -1], [0, 0, 0], [1, 1, 1]], dtype=np.float32)


def _safe_normalize_np(arr: np.ndarray) -> np.ndarray:
    a_min, a_max = arr.min(), arr.max()
    if a_max == a_min:
        a_max = a_min + 1e-6
    return 255.0 * (arr - a_min) / (a_max - a_min)


def _convolve_reflect_np(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """3x3 correlation with scipy.ndimage 'reflect' boundary.

    scipy.ndimage.convolve flips the kernel (true convolution) and uses
    (d c b a | a b c d) edge reflection, i.e. np.pad mode='symmetric'.
    """
    k = kernel[::-1, ::-1]  # convolution = correlation with flipped kernel
    padded = np.pad(img, 1, mode="symmetric")
    out = np.zeros_like(img, dtype=np.float32)
    for dy in range(3):
        for dx in range(3):
            out += k[dy, dx] * padded[dy : dy + img.shape[0], dx : dx + img.shape[1]]
    return out


def depth_to_3ch_numpy(depth: np.ndarray, imagenet_bake: bool = False) -> np.ndarray:
    """Encode a raw depth map [H, W] to uint8 [H, W, 3].

    Channels: (normalized depth, gradient magnitude, gradient direction).
    """
    depth_array = depth.astype(np.float32)

    depth_min, depth_max = depth_array.min(), depth_array.max()
    if depth_max == depth_min:
        depth_max = depth_min + 1e-6
    depth_norm = (255.0 * (depth_array - depth_min) / (depth_max - depth_min)).astype(
        np.uint8
    )

    g = depth_norm.astype(np.float32)
    gx = _convolve_reflect_np(g, _KX)
    gy = _convolve_reflect_np(g, _KY)

    gm = np.sqrt(gx**2 + gy**2)
    gtheta = np.arctan2(gy, gx)

    gm_norm = _safe_normalize_np(gm).astype(np.uint8)
    gtheta_norm = _safe_normalize_np(gtheta).astype(np.uint8)

    out = np.dstack([depth_norm, gm_norm, gtheta_norm])

    if imagenet_bake:
        # Reference eval quirk: apply ImageNet mean/std to the float image,
        # re-normalize each channel to [0,255] uint8
        # (evaluate_onevision.py:279-288).
        f = out.astype(np.float32) / 255.0
        f = (f - _IMAGENET_MEAN) / _IMAGENET_STD
        ch = []
        for c in range(3):
            ch.append(_safe_normalize_np(f[..., c]).astype(np.uint8))
        out = np.dstack(ch)
    return out


# ---------------------------------------------------------------------------
# JAX implementation (batched, jit-able)
# ---------------------------------------------------------------------------

def _safe_normalize_jnp(arr: jnp.ndarray) -> jnp.ndarray:
    a_min = arr.min()
    a_max = arr.max()
    a_max = jnp.where(a_max == a_min, a_min + 1e-6, a_max)
    return 255.0 * (arr - a_min) / (a_max - a_min)


def _conv3x3_reflect_jnp(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """3x3 true convolution with symmetric reflection, via 9 shifted adds.

    Shift-and-add keeps this as cheap VPU work that XLA fuses with the
    surrounding normalization; no im2col / gather needed.
    """
    k = kernel[::-1, ::-1]
    padded = jnp.pad(img, 1, mode="symmetric")
    h, w = img.shape
    out = jnp.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx] != 0.0:
                out = out + k[dy, dx] * jax.lax.dynamic_slice(
                    padded, (dy, dx), (h, w)
                )
    return out


def depth_to_3ch_jax(depth: jnp.ndarray) -> jnp.ndarray:
    """Jax version of :func:`depth_to_3ch_numpy` (no imagenet bake).

    Input [H, W] float/int; output uint8 [H, W, 3].  vmap over a leading
    batch axis for batched encoding.
    """
    depth_array = depth.astype(jnp.float32)
    d_min = depth_array.min()
    d_max = depth_array.max()
    d_max = jnp.where(d_max == d_min, d_min + 1e-6, d_max)
    depth_norm = (255.0 * (depth_array - d_min) / (d_max - d_min)).astype(jnp.uint8)

    g = depth_norm.astype(jnp.float32)
    gx = _conv3x3_reflect_jnp(g, _KX)
    gy = _conv3x3_reflect_jnp(g, _KY)

    gm = jnp.sqrt(gx**2 + gy**2)
    gtheta = jnp.arctan2(gy, gx)

    gm_norm = _safe_normalize_jnp(gm).astype(jnp.uint8)
    gtheta_norm = _safe_normalize_jnp(gtheta).astype(jnp.uint8)

    return jnp.stack([depth_norm, gm_norm, gtheta_norm], axis=-1)


def depth_to_gray3_numpy(depth: np.ndarray) -> np.ndarray:
    """1D-depth variant: normalized grayscale replicated x3.

    Reference: ``CustomSUNRGBDDatasetOneVision1DDepth.py:54-68``.
    """
    depth_array = depth.astype(np.float32)
    d_min, d_max = depth_array.min(), depth_array.max()
    if d_max == d_min:
        d_max = d_min + 1e-6
    norm = (255.0 * (depth_array - d_min) / (d_max - d_min)).astype(np.uint8)
    return np.stack([norm] * 3, axis=-1)
