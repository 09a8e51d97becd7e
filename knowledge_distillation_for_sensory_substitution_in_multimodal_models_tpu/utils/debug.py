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
    """Bitwise-deterministic region: partitionable threefry PRNG (same
    stream regardless of sharding) + matmul precision pinned to highest.

    TPU executions are already run-to-run deterministic for a fixed
    compiled program (no atomics-based reductions, unlike GPU — so there
    is no TPU analog of ``--xla_gpu_deterministic_ops`` to set); the knobs
    here remove the two *cross-configuration* sources of divergence:
    PRNG partitioning and precision-dependent matmul rewrites.  Use in
    tests comparing across mesh shapes.
    """
    import jax

    prev_threefry = jax.config.jax_threefry_partitionable
    prev_precision = jax.config.jax_default_matmul_precision
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        yield jax.random.PRNGKey(seed)
    finally:
        jax.config.update("jax_threefry_partitionable", prev_threefry)
        jax.config.update("jax_default_matmul_precision", prev_precision)
