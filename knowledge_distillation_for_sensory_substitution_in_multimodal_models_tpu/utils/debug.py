"""Runtime debug switches (SURVEY.md §5 "race detection / sanitizers"):
the reference has none (single-process, single-GPU); the TPU-native
equivalents are jax's compiled-runtime checks plus a deterministic mode
for bitwise-reproducible test runs."""

from __future__ import annotations

import contextlib


def enable_nan_checks() -> None:
    """Raise on any NaN produced inside jitted code (jax_debug_nans)."""
    import jax

    jax.config.update("jax_debug_nans", True)


@contextlib.contextmanager
def deterministic_mode(seed: int = 0):
    """Bitwise-deterministic region: fixed XLA reductions + threefry
    partitionable PRNG.  Use in tests comparing across mesh shapes."""
    import os

    import jax

    old_flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        old_flags + " --xla_gpu_deterministic_ops=true"
    ).strip()
    prev = jax.config.jax_threefry_partitionable
    jax.config.update("jax_threefry_partitionable", True)
    try:
        yield jax.random.PRNGKey(seed)
    finally:
        jax.config.update("jax_threefry_partitionable", prev)
        os.environ["XLA_FLAGS"] = old_flags
