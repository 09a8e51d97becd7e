"""CheckpointManager: val_loss naming, save_top_k=1 pruning, lowest-loss
resume, partial restore, preemption snapshots."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.train.checkpoint import (
    CheckpointManager,
    checkpoint_name,
    extract_val_loss,
    find_best_checkpoint,
)


def _state(x):
    return {
        "params": {"w": jnp.full((4, 4), float(x))},
        "opt_state": {"mu": jnp.zeros((4, 4))},
        "step": np.asarray(int(x)),
    }


def test_val_loss_name_roundtrip():
    name = checkpoint_name(3, 0.1234)
    assert name == "epoch=03-val_loss=0.1234.ckpt"
    assert extract_val_loss(name) == pytest.approx(0.1234)
    assert extract_val_loss("garbage.ckpt") == float("inf")


def test_top1_pruning_and_resume(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    p1 = mgr.save(0, 2.0, _state(1))
    assert p1 is not None
    # worse loss -> not saved
    assert mgr.save(1, 3.0, _state(2)) is None
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]) == 1
    # better loss -> saved, previous pruned
    p3 = mgr.save(2, 1.0, _state(3))
    assert p3 is not None
    names = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert names == ["epoch=02-val_loss=1.0000.ckpt"]
    assert find_best_checkpoint(str(tmp_path)).endswith(names[0])

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), _state(0)
    )
    restored, path = mgr.restore_best(abstract)
    assert path.endswith(names[0])
    assert float(restored["params"]["w"][0, 0]) == 3.0
    assert int(restored["step"]) == 3


def test_partial_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, 1.0, _state(7))
    path = find_best_checkpoint(str(tmp_path))
    abstract = {"params": jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
        _state(0)["params"],
    )}
    out = mgr.restore(path, abstract, partial=True)
    assert float(out["params"]["w"][0, 0]) == 7.0
    assert set(out.keys()) == {"params"}


def test_preempt_snapshot(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(0, 1.0, _state(1))
    p = mgr.save_preempt(42, _state(9))
    assert "preempt-step=42" in p
    # preempt snapshot does not disturb the top-1 best
    assert "val_loss=1.0000" in find_best_checkpoint(str(tmp_path))
