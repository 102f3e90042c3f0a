# Developer recipes (the reference uses a Justfile; make is baked into this
# image). All test/CI targets run on the JAX CPU backend.

PYTEST ?= python -m pytest

.PHONY: test test-fast test-smoke bench train-test native lint dryrun

# Full suite ~37 min (352 tests, idle 8-vCPU); fast tier ~12 min;
# smoke tier <5 min (core exactness per subsystem).
test:
	$(PYTEST) tests/ -q

test-fast:
	$(PYTEST) tests/ -q -m "not slow"

test-smoke:
	$(PYTEST) -q tests/test_processor.py tests/test_mel.py \
	  tests/test_decoder_parity.py tests/test_encoder_parity.py \
	  tests/test_data.py tests/test_evaluation.py tests/test_ifeval.py \
	  tests/test_inference.py tests/test_loading.py tests/test_recipes.py \
	  tests/test_segment_attention.py tests/test_paged_attention.py

bench:
	python bench.py

native:
	python -c "from ultravox_tpu.native import audio_dsp; print(audio_dsp.build(force=True))"

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

train-test:
	JAX_PLATFORMS=cpu python -m ultravox_tpu.training.train \
	  --config_path ultravox_tpu/training/configs/test_train.yaml \
	  --output_dir /tmp/uvtpu-train-test --text_model ""

lint:
	python -m ruff check ultravox_tpu/ tests/ || true

serve:
	python -m ultravox_tpu.inference.serving.api_server --model $(MODEL)

multihost-smoke:
	$(PYTEST) tests/test_multihost.py -q

docker:
	docker build -f docker/Dockerfile -t ultravox-tpu .
