from .mesh import make_mesh, shard_axis
from .dist_join import DistJoinConfig, distributed_join

__all__ = ["make_mesh", "shard_axis", "DistJoinConfig", "distributed_join"]
