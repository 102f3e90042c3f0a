"""Utilities: audio DSP, logging, retry helpers."""
