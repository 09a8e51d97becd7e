"""The training loop: epochs of accumulated pjit steps + val epochs +
checkpointing + TensorBoard scalars.

Replaces ``pl.Trainer(...).fit`` (`phase1/train_online_kd.py:142-169`).
Scalar names match the reference's Lightning logs (``train_loss``,
``val_loss``) so TensorBoard dashboards carry over.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.training.train_state import TrainState

from ..configs import TrainConfig
from .checkpoint import CheckpointManager
from .step import KDModels, make_eval_step, make_train_step


class TBWriter:
    """tensorboardX writer, no-op if unavailable."""

    def __init__(self, logdir: Optional[str], run_name: str):
        self._w = None
        if logdir:
            try:
                from tensorboardX import SummaryWriter

                self._w = SummaryWriter(f"{logdir}/{run_name}")
            except Exception:
                pass

    def scalar(self, tag: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, value, step)

    def close(self):
        if self._w is not None:
            self._w.close()


def run_training(
    models: KDModels,
    cfg: TrainConfig,
    state: TrainState,
    teacher_params: Any,
    train_loader,
    val_loader,
    *,
    ckpt_dir: Optional[str] = None,
    tb_logdir: Optional[str] = None,
    run_name: str = "run",
    mesh=None,
    shard_batch_fn: Optional[Callable] = None,
    log_every: int = 10,
    profile_dir: Optional[str] = None,
    compiler_options: Optional[dict] = None,
) -> TrainState:
    """Epoch loop; returns the final state.

    ``shard_batch_fn(batch) -> device batch`` handles host->mesh transfer;
    defaults to jnp.asarray.  ``compiler_options`` is forwarded to the
    step jits (cli/common.py::tpu_compiler_options raises the scoped-VMEM
    limit for the big-block Pallas kernels on TPU).
    """
    train_step = jax.jit(make_train_step(models, cfg), donate_argnums=(0,),
                         compiler_options=compiler_options)
    eval_step = jax.jit(make_eval_step(models, cfg),
                        compiler_options=compiler_options)
    put = shard_batch_fn or (lambda b: jax.tree.map(jnp.asarray, b))
    tb = TBWriter(tb_logdir, run_name)
    ckpt = CheckpointManager(ckpt_dir) if ckpt_dir else None

    # Preemption handling (SURVEY.md §5 "failure detection": absent in the
    # reference; TPU VMs get SIGTERM before eviction): snapshot the state
    # at the next step boundary, then resume restores it.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True

    try:
        prev_handler = signal.signal(signal.SIGTERM, _on_term)
    except ValueError:  # non-main thread
        prev_handler = None

    step_i = int(state.step)
    for epoch in range(cfg.max_epochs):
        t_epoch = time.time()
        n_samples = 0
        for batch in train_loader:
            batch.pop("question_id", None)
            a, b = batch["student_input_ids"].shape[:2]
            if profile_dir and step_i == 2:
                jax.profiler.start_trace(profile_dir)
            state, metrics = train_step(state, teacher_params, put(batch))
            if profile_dir and step_i == 4:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
            n_samples += a * b
            if step_i % log_every == 0:
                loss = float(metrics["loss"])
                tb.scalar("train_loss", loss, step_i)
                for k, v in metrics.items():
                    if k != "loss":
                        tb.scalar(f"train/{k}", float(v), step_i)
                rate = n_samples / max(time.time() - t_epoch, 1e-9)
                print(
                    f"epoch {epoch} step {step_i} loss {loss:.4f} "
                    f"({rate:.2f} samples/s)",
                    flush=True,
                )
            step_i += 1
            if preempted["flag"]:
                if ckpt is not None:
                    path = ckpt.save_preempt(
                        step_i,
                        {"params": state.params, "opt_state": state.opt_state,
                         "step": np.asarray(step_i)},
                    )
                    print(f"preempted: saved {path}", flush=True)
                tb.close()
                return state

        # ---- validation epoch ----
        # Accumulate on device and fetch ONCE per epoch: through the axon
        # tunnel every host fetch costs ~30 ms RTT, so a per-micro-batch
        # float() stalls the whole val epoch (30 ms x A x |val set|).
        val_sum, val_n = None, 0
        for batch in val_loader:
            batch.pop("question_id", None)
            micro_batches = batch["student_input_ids"].shape[0]
            db = put(batch)
            for a_i in range(micro_batches):
                m = eval_step(
                    state.params, teacher_params,
                    jax.tree.map(lambda x: x[a_i], db),
                )
                val_sum = m["loss"] if val_sum is None else val_sum + m["loss"]
                val_n += 1
        val_loss = float(val_sum) / val_n if val_n else float("nan")
        tb.scalar("val_loss", val_loss, step_i)
        print(f"epoch {epoch} val_loss {val_loss:.4f}", flush=True)

        if ckpt is not None and val_loss == val_loss:
            saved = ckpt.save(
                epoch, val_loss,
                {"params": state.params, "opt_state": state.opt_state,
                 "step": np.asarray(step_i)},
            )
            if saved:
                print(f"saved checkpoint {saved}", flush=True)

    tb.close()
    return state
