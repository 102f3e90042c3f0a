"""Numeric building blocks: norms, rope, attention, mel frontend, sampling,
and Pallas TPU kernels."""
