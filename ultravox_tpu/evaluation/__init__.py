"""Evaluation layer: metric registries, eval CLI, val-loss validation."""
