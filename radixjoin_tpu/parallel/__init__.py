from .mesh import make_mesh, shard_axis
from .dist_join import DistJoinConfig, distributed_join
from .dist_executor import execute_distributed
from . import multihost

__all__ = [
    "make_mesh",
    "shard_axis",
    "DistJoinConfig",
    "distributed_join",
    "execute_distributed",
    "multihost",
]
