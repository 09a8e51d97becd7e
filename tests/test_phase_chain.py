"""The reference's actual 3-phase double-trouble workflow, end-to-end
through the real CLI: phase 1 → phase 2 → phase 3 with best-checkpoint
hand-off between phases (`phase2/train_online_kd.py:88`) and the per-phase
freeze schedule observable in the saved checkpoints."""

import os

import numpy as np
import pytest
import jax
import orbax.checkpoint as ocp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli import (
    train_online_kd,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train.checkpoint import (
    find_best_checkpoint,
)

pytestmark = pytest.mark.slow


def _raw_params(path):
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))["params"]


def _flat_diff(a, b):
    """Max |a-b| over a param subtree."""
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    return max(
        float(np.max(np.abs(np.asarray(x, np.float32)
                            - np.asarray(y, np.float32))))
        for x, y in zip(leaves_a, leaves_b)
    )


def test_three_phase_chain(tmp_path, capsys):
    ck = str(tmp_path / "ckpts")
    args = [
        "--synthetic_data", "--cpu", "--batch_size", "1", "--max_epochs", "1",
        "--subset_percentage", "0.02", "--kd_mode", "double_trouble",
        "--learning_rate", "1e-3", "--num_workers", "0",
        "--checkpoint_dir", ck, "--tensorboard_dir", str(tmp_path / "tb"),
    ]
    for phase in ("1", "2", "3"):
        train_online_kd.main(args + ["--phase", phase])
    out = capsys.readouterr().out
    # phases 2 and 3 must each initialize from the previous phase's best
    assert out.count("phase hand-off: initialized from") == 2, out[-2000:]

    best = {
        p: find_best_checkpoint(os.path.join(ck, f"kd_double_trouble_phase{p}"))
        for p in (1, 2, 3)
    }
    assert all(best.values()), best
    p1, p2, p3 = (_raw_params(best[p]) for p in (1, 2, 3))

    # Phase 2 freezes the vision tower: its phase-2 checkpoint must carry
    # phase 1's vision tower bit-exactly, while the LM (frozen in phase 1,
    # trained in phase 2) must have moved.
    assert _flat_diff(p1["vision_tower"], p2["vision_tower"]) == 0.0
    assert _flat_diff(p1["language_model"], p2["language_model"]) > 0.0
    # Phase 3 trains everything: both towers move from phase 2.
    assert _flat_diff(p2["vision_tower"], p3["vision_tower"]) > 0.0
    assert _flat_diff(p2["language_model"], p3["language_model"]) > 0.0
