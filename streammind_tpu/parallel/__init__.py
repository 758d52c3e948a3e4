from .mesh import AXES, default_mesh, make_mesh, replicated, single_device_mesh
from .partitioning import param_shardings, param_specs, shard_params, spec_for
