from .mesh import AXES, default_mesh, make_mesh, replicated, single_device_mesh
from .partitioning import param_shardings, param_specs, shard_params, spec_for
from .serving import (
    kv_cache_shardings,
    kv_cache_specs,
    mesh_fits_inference,
    shard_kv_cache,
    shard_stream_state,
    stream_state_shardings,
    stream_state_specs,
)
