"""ultravox_tpu — a TPU-native speech+text multimodal LLM framework.

A from-scratch JAX/XLA/Pallas/pjit implementation of the capabilities of
fixie-ai/ultravox: a frozen audio encoder feeding a small trainable projector
whose outputs are spliced into the token-embedding stream of a frozen LLM at
``<|audio|>`` placeholder positions, plus the training / evaluation / data /
inference harness around that model family.

Subpackages
-----------
- ``models``     — model configs, Whisper-style encoder, projector, decoder LLMs,
                   the composite Ultravox model, processor, weight loading.
- ``ops``        — numerics: mel frontend, attention, norms, rope, sampling,
                   Pallas TPU kernels.
- ``parallel``   — device mesh construction, logical-axis sharding rules,
                   multi-host collectives.
- ``data``       — VoiceSample, streaming datasets, registry, augmentations.
- ``training``   — train configs, pjit train step, checkpointing, CLI.
- ``inference``  — offline & streaming inference, continuous-batching engine.
- ``evaluation`` — metric registries, eval CLI, val-loss validation.
- ``tools``      — model surgery, publishing, dataset tooling.
"""

__version__ = "0.1.0"


def pipeline(model: str, **kwargs):
    """One-call speech+text inference (reference: the "ultravox-pipeline" HF
    pipeline registration, model/ultravox_pipeline.py). Lazy import so that
    ``import ultravox_tpu`` stays dependency-light."""
    from ultravox_tpu.pipeline import pipeline as _pipeline

    return _pipeline(model, **kwargs)
