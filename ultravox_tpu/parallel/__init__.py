"""Device mesh, sharding rules, and multi-host collectives."""

from ultravox_tpu.parallel.mesh import MeshConfig, make_mesh  # noqa: F401
from ultravox_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_layers,
    pipelined_decoder_hidden,
)
from ultravox_tpu.parallel.sharding import (  # noqa: F401
    DEFAULT_RULES,
    batch_sharding,
    param_pspecs,
    shard_params,
)
