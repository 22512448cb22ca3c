from .mesh import MeshConfig, create_mesh, shard_batch, replicate

__all__ = ["MeshConfig", "create_mesh", "shard_batch", "replicate"]
