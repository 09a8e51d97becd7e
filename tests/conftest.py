"""Test config: force an 8-device virtual CPU platform so multi-chip sharding
tests run without TPUs (SURVEY.md §4).

Note: this environment's sitecustomize registers a TPU PJRT plugin and
force-sets ``jax_platforms="axon,cpu"`` via ``jax.config.update`` — env vars
alone cannot override it, so we update the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

# KDSS_TEST_TPU=1 keeps the real TPU backend (for the TPU-gated hardware
# tests, e.g. the fused-CE partial-edge-block smoke test); default is the
# 8-device virtual CPU platform for the sharding suite.
if not os.environ.get("KDSS_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")


# Run the heaviest in-process-compile test files FIRST.  Late in the
# suite the process carries GBs of live jit executables and HF fixtures,
# and big XLA:CPU compiles slow ~3x under that load (measured: the
# Optuna-search drive takes 125 s solo/early vs 790 s when it ran last).
# The sort is stable, so relative order elsewhere is unchanged; tests are
# independent (tmp_path/monkeypatch), ordering is purely a wall-time fix.
_HEAVY_FIRST = [
    "test_panesar_optuna.py",
    "test_phase_chain.py",
    "test_panesar.py",
]


def pytest_collection_modifyitems(session, config, items):
    rank = {name: i for i, name in enumerate(_HEAVY_FIRST)}
    items.sort(key=lambda it: rank.get(it.path.name, len(_HEAVY_FIRST)))
