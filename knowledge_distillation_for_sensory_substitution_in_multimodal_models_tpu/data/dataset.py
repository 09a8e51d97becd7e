"""SUNRGBD VQA dataset: CSV ingest + dual-stream image loading.

Reference parity (`dataset/dataloader/OneVision/CustomSUNRGBDDatasetOneVision.py`):

* CSV at ``<root>/SUNRGBD/csv_data/<name>`` with columns
  [Question_Id, Questions, Answers, Image_Path, Depth_Path, ...] addressed
  positionally (iloc 1..4, `:186-187,209-210`);
* ``subset_percentage`` head-slice (`:52-55`);
* image paths joined under ``<root>/SUNRGBD`` with the duplicated
  "SUNRGBD" segment stripped (`remove_substring_from_path`, `:22-26`);
* depth stream encoded via Prewitt depth->3ch (``data/depth.py``);
* the reference's torchvision augmentations are computed-then-discarded
  dead code (SURVEY.md §2.5 #1) — deliberately NOT reproduced; the
  ``augmentation`` flag is accepted for CLI parity and only affects run
  names, exactly like the reference's effective behavior.

Also provides the 1D-depth variant (grayscale x3, ``...1DDepth.py:54-68``)
and the DAQUAR path scheme (``DAQUARDatasetOneVision.py:119-135``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd
from PIL import Image

from .depth import depth_to_3ch_numpy, depth_to_gray3_numpy


def remove_duplicate_sunrgbd_segment(path: str, substring: str = "SUNRGBD") -> str:
    """Strip the first occurrence of the segment (reference `:22-26`)."""
    index = path.find(substring)
    if index != -1:
        path = path[:index] + path[index + len(substring):]
    return path


class SUNRGBDVQADataset:
    """Map-style dataset yielding (question, answer, rgb_np, depth3_np, idx)."""

    def __init__(
        self,
        root_data_dir: str,
        csv_file_name: str,
        subset_percentage: Optional[float] = None,
        depth_encoding: str = "prewitt",  # "prewitt" | "gray3"
    ):
        self.csv_file_path = os.path.join(root_data_dir, "SUNRGBD/csv_data", csv_file_name)
        self.df = pd.read_csv(self.csv_file_path)
        if subset_percentage is not None:
            # reference head-slice (`int(len*pct)`), floored at 1 row so a
            # tiny csv × small pct never yields an empty (NaN-val) dataset
            subset_size = max(1, int(len(self.df) * subset_percentage))
            self.df = self.df.iloc[:subset_size]
        self.dataset_directory = os.path.join(root_data_dir, "SUNRGBD")
        # "prewitt_imagenet" reproduces the eval-path quirk of baking
        # ImageNet normalization into the uint8 image before the processor
        # normalizes again (SURVEY.md §2.5 #5, `evaluate_onevision.py:279-288`).
        assert depth_encoding in ("prewitt", "gray3", "prewitt_imagenet")
        self.depth_encoding = depth_encoding

    def __len__(self) -> int:
        return len(self.df)

    def image_paths(self, idx: int) -> Tuple[str, str]:
        rgb = os.path.join(self.dataset_directory, self.df.iloc[idx, 3])
        depth = os.path.join(self.dataset_directory, self.df.iloc[idx, 4])
        return (
            remove_duplicate_sunrgbd_segment(rgb).replace("\\", "/"),
            remove_duplicate_sunrgbd_segment(depth).replace("\\", "/"),
        )

    def __getitem__(self, idx: int):
        rgb_path, depth_path = self.image_paths(idx)
        rgb = np.array(Image.open(rgb_path).convert("RGB"))
        depth_raw = np.array(Image.open(depth_path))
        if self.depth_encoding == "prewitt":
            # native C++ path when built (bit-exact; numpy fallback inside)
            from .native import depth_to_3ch_native

            depth3 = depth_to_3ch_native(depth_raw)
        elif self.depth_encoding == "prewitt_imagenet":
            # eval-quirk variant, also native since r5 (the evaluator's
            # host hot loop — bench.py --mode eval_loop host_frac)
            from .native import depth_to_3ch_native

            depth3 = depth_to_3ch_native(depth_raw, imagenet_bake=True)
        else:
            depth3 = depth_to_gray3_numpy(depth_raw)
        question = str(self.df.iloc[idx, 1])
        answer = str(self.df.iloc[idx, 2])
        return question, answer, rgb, depth3, idx


class VQAv2Dataset:
    """Minimal COCO VQAv2 loader (reference
    `dataset/dataloader/VQAv2Dataset.py:7-67`): annotation + question JSONs
    keyed by image_id, answers = most-common annotation answer."""

    def __init__(self, questions_json: str, annotations_json: str, images_dir: str):
        import json as _json

        with open(questions_json) as f:
            qs = _json.load(f)["questions"]
        with open(annotations_json) as f:
            anns = {a["question_id"]: a for a in _json.load(f)["annotations"]}
        self.items = []
        for q in qs:
            a = anns.get(q["question_id"])
            if a is None:
                continue
            self.items.append(
                (q["question"], a["multiple_choice_answer"], q["image_id"])
            )
        self.images_dir = images_dir

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int):
        question, answer, image_id = self.items[idx]
        path = os.path.join(
            self.images_dir, f"COCO_train2014_{image_id:012d}.jpg"
        )
        rgb = np.array(Image.open(path).convert("RGB"))
        return question, answer, rgb, rgb, idx


class DAQUARVQADataset(SUNRGBDVQADataset):
    """DAQUAR (NYU-Depth) variant: path scheme ``images/<name>.png`` +
    ``depth/<name>_depth.png`` (`DAQUARDatasetOneVision.py:119-135`)."""

    def __init__(
        self,
        root_data_dir: str,
        csv_file_name: str,
        subset_percentage: Optional[float] = None,
    ):
        self.csv_file_path = os.path.join(root_data_dir, csv_file_name)
        self.df = pd.read_csv(self.csv_file_path)
        if subset_percentage is not None:
            self.df = self.df.iloc[: int(len(self.df) * subset_percentage)]
        self.dataset_directory = root_data_dir
        self.depth_encoding = "prewitt"

    def image_paths(self, idx: int) -> Tuple[str, str]:
        name = str(self.df.iloc[idx, 3])
        stem = os.path.splitext(os.path.basename(name))[0]
        return (
            os.path.join(self.dataset_directory, "images", f"{stem}.png"),
            os.path.join(self.dataset_directory, "depth", f"{stem}_depth.png"),
        )
