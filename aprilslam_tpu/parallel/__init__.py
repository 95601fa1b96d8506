from .mesh import make_mesh, shard_leading, replicated
from .distributed_ba import build_distributed_ba, shard_observations_by_owner
from .sequences import build_parallel_slam

__all__ = [
    "make_mesh",
    "shard_leading",
    "replicated",
    "build_distributed_ba",
    "shard_observations_by_owner",
    "build_parallel_slam",
]
