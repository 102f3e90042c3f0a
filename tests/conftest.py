"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding code paths compile and execute in CI without TPUs
(mirrors the reference's CPU-only CI strategy, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import pytest  # noqa: E402

import jax  # noqa: E402  (after env setup)

# Heavy integration modules (measured ≥~1 min each on an idle 8-vCPU
# runner; full suite ≈ 37 min at 352 tests). `make test-fast` deselects
# them (-m "not slow") for a ~12-min inner loop; `make test-smoke` runs a
# curated <5-min core. Keep this list in sync with pytest --durations.
_SLOW_MODULES = {
    "test_spec_decode", "test_train_integration", "test_paged_serving",
    "test_serving", "test_hub_code", "test_multihost", "test_training",
    "test_sharding", "test_multi_lora", "test_flash_attention",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__.split(".")[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)

# The environment's sitecustomize registers the axon TPU PJRT plugin and
# forces the platform; the env var alone doesn't stick — override via config.
jax.config.update("jax_platforms", "cpu")

# fp32 parity tests need true-fp32 matmuls/convs; JAX's default precision
# lowers them to bf16-class accumulation even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")
