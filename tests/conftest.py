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

import jax  # noqa: E402  (after env setup)

# The environment's sitecustomize registers the axon TPU PJRT plugin and
# forces the platform; the env var alone doesn't stick — override via config.
jax.config.update("jax_platforms", "cpu")

# fp32 parity tests need true-fp32 matmuls/convs; JAX's default precision
# lowers them to bf16-class accumulation even on CPU.
jax.config.update("jax_default_matmul_precision", "highest")
