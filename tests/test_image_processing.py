"""Native anyres image preprocessing vs the HF LlavaOnevisionImageProcessor
(tile values, order, and counts)."""

import numpy as np
import pytest

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    llava_onevision_0_5b,
    llava_onevision_tiny,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.anyres import (
    num_tiles,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.image_processing import (
    process_anyres_batch,
    process_anyres_image,
)


def _hf_processor(cfg):
    from transformers.models.llava_onevision.image_processing_llava_onevision import (
        LlavaOnevisionImageProcessor,
    )

    return LlavaOnevisionImageProcessor(
        size={"height": cfg.vision.image_size, "width": cfg.vision.image_size},
        image_grid_pinpoints=[list(p) for p in cfg.image_grid_pinpoints],
        image_mean=[0.5, 0.5, 0.5],
        image_std=[0.5, 0.5, 0.5],
        do_convert_rgb=False,
    )


@pytest.mark.parametrize(
    "cfg,sizes",
    [
        (llava_onevision_tiny(), [(45, 67), (80, 30), (28, 28), (90, 90)]),
        (llava_onevision_0_5b(), [(530, 730)]),  # the SUNRGBD frame size
    ],
    ids=["tiny", "sunrgbd"],
)
def test_matches_hf_processor(cfg, sizes):
    proc = _hf_processor(cfg)
    rng = np.random.default_rng(0)
    for h, w in sizes:
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        hf = proc([img], return_tensors="np")["pixel_values"][0]  # [T, 3, S, S]
        ours, n = process_anyres_image(img, cfg)
        want_n = num_tiles((h, w), cfg.image_grid_pinpoints, cfg.vision.image_size)
        assert n == want_n == hf.shape[0]
        got = ours[:n].transpose(0, 3, 1, 2)
        # bicubic kernels differ minutely between PIL invocations on
        # float conversions; tolerance covers that
        np.testing.assert_allclose(got, hf, atol=2e-2)
        # padded tiles zero
        assert np.all(ours[n:] == 0)


def test_batch_tile_valid():
    cfg = llava_onevision_tiny()
    rng = np.random.default_rng(1)
    imgs = [
        rng.integers(0, 255, size=(45, 67, 3)).astype(np.uint8),
        rng.integers(0, 255, size=(30, 80, 3)).astype(np.uint8),
    ]
    pixels, tile_valid = process_anyres_batch(imgs, cfg)
    assert pixels.shape[:2] == (2, cfg.max_tiles)
    for i, img in enumerate(imgs):
        n = num_tiles(img.shape[:2], cfg.image_grid_pinpoints, cfg.vision.image_size)
        assert tile_valid[i, :n].all() and not tile_valid[i, n:].any()
