"""Serving: continuous-batching engine + OpenAI-protocol API server.

The TPU-native replacement for the reference's external vLLM server
(inference/run_vllm_inference.py): requests stream in, prefills are inserted
into free KV-cache slots, and one compiled decode step advances every active
request per iteration.
"""

from ultravox_tpu.inference.serving.engine import ServingEngine  # noqa: F401
