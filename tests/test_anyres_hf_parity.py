"""Anyres resolution selection pinned DIRECTLY against HF transformers
(round-2 lesson: a miscounted tile grid silently mis-sized a benchmark;
fixture-based processor tests don't guard the selection logic itself)."""

import pytest

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.configs import (
    llava_onevision_0_5b,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.data.anyres import (
    num_tiles,
    select_best_resolution,
)

hf_ip = pytest.importorskip(
    "transformers.models.llava_onevision.image_processing_llava_onevision"
)

CFG = llava_onevision_0_5b()

# SUNRGBD sensor frame sizes + edge shapes (square, tall, wide, tiny, huge)
SIZES = [
    (530, 730), (427, 561), (441, 591), (384, 384), (100, 900),
    (900, 100), (50, 60), (2000, 1500), (729, 972), (768, 768),
    (385, 385), (383, 1153),
]


@pytest.mark.parametrize("size", SIZES)
def test_select_best_resolution_matches_hf(size):
    pins = [list(p) for p in CFG.image_grid_pinpoints]
    ours = select_best_resolution(size, CFG.image_grid_pinpoints)
    hf = tuple(hf_ip.select_best_resolution(size, pins))
    assert ours == hf, (size, ours, hf)


@pytest.mark.parametrize("size", SIZES)
def test_num_tiles_matches_hf(size):
    from transformers.models.llava_onevision.modeling_llava_onevision import (
        image_size_to_num_patches,
    )

    pins = [list(p) for p in CFG.image_grid_pinpoints]
    ours = num_tiles(size, CFG.image_grid_pinpoints, CFG.vision.image_size)
    hf = image_size_to_num_patches(size, pins, CFG.vision.image_size)
    assert ours == hf, (size, ours, hf)
