from .mesh import data_mesh, replicate, shard_leading  # noqa: F401
