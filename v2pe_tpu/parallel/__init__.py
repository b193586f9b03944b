from v2pe_tpu.parallel.mesh import make_mesh, param_sharding, batch_sharding

__all__ = ["make_mesh", "param_sharding", "batch_sharding"]
