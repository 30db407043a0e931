from .mesh import MeshSpec, create_mesh, data_sharding, replicated  # noqa: F401
