from .mesh import make_mesh, batch_sharding, shard_params, param_pspecs
