"""Training layer: configs, pjit train step, checkpointing, CLI."""
