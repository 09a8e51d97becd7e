"""Orbax checkpointing with the reference's filename/resume conventions.

Reference behavior being preserved (so CLI workflows port 1:1):
* checkpoints carry the validation loss in their name
  (``...val_loss=0.1234.ckpt``-style, Lightning ModelCheckpoint
  `phase1/train_online_kd.py:128-134`);
* resume scans the checkpoint dir and loads the LOWEST val_loss
  (`extract_val_loss` + glob, `train_online_kd.py:46-53,86-107`);
* ``save_top_k=1``: older checkpoints are pruned on improvement;
* phase hand-off (phase N+1 starts from phase N's best checkpoint,
  `phase2/train_online_kd.py:88`).

TPU-native: Orbax (async-capable) saves of the *student* params + optimizer
state + step only — the frozen teacher restores from converted HF weights,
never from training checkpoints (it never changes).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


_VAL_RE = re.compile(r"val_loss=([\d.]+?)\.ckpt")


def checkpoint_name(epoch: int, val_loss: float) -> str:
    return f"epoch={epoch:02d}-val_loss={val_loss:.4f}.ckpt"


def extract_val_loss(filename: str) -> float:
    """Reference `train_online_kd.py:46-53`: inf when absent."""
    m = _VAL_RE.search(filename)
    return float(m.group(1)) if m else float("inf")


def find_best_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Lowest-val_loss checkpoint path, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    names = [n for n in os.listdir(ckpt_dir) if n.endswith(".ckpt")]
    if not names:
        return None
    best = min(names, key=extract_val_loss)
    return os.path.join(ckpt_dir, best)


class CheckpointManager:
    """save_top_k=1 manager over Orbax PyTree checkpoints."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, epoch: int, val_loss: float, state: Any) -> Optional[str]:
        """Save if val_loss improves on the best existing; prune the old."""
        prev = find_best_checkpoint(self.ckpt_dir)
        if prev is not None and extract_val_loss(prev) <= val_loss:
            return None
        path = os.path.join(self.ckpt_dir, checkpoint_name(epoch, val_loss))
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        if prev is not None:
            shutil.rmtree(prev, ignore_errors=True)
        return path

    def save_preempt(self, step: int, state: Any) -> str:
        """Unconditional snapshot outside the top-k policy (preemption)."""
        path = os.path.join(self.ckpt_dir, f"preempt-step={step}.ckpt")
        shutil.rmtree(path, ignore_errors=True)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        return path

    def restore_best(self, abstract_state: Any) -> Tuple[Optional[Any], Optional[str]]:
        path = find_best_checkpoint(self.ckpt_dir)
        if path is None:
            return None, None
        return self._ckptr.restore(path, abstract_state), path

    def restore(self, path: str, abstract_state: Any, partial: bool = False) -> Any:
        """Restore; ``partial=True`` loads a sub-tree (e.g. params only, the
        eval path's student extraction — the reference's analog is
        ``model.student_model`` pulled out of the Lightning checkpoint,
        `evaluate_onevision.py:65-75`)."""
        path = os.path.abspath(path)
        if partial:
            import jax

            restore_args = jax.tree.map(
                lambda s: ocp.RestoreArgs(restore_type=None), abstract_state
            )
            with ocp.PyTreeCheckpointer() as ckptr:
                return ckptr.restore(
                    path,
                    args=ocp.args.PyTreeRestore(
                        item=abstract_state,
                        restore_args=restore_args,
                        partial_restore=True,
                    ),
                )
        return self._ckptr.restore(path, abstract_state)
