"""Multi-chip sharding: inference (mesh) and training (train) forms."""
from .mesh import ShardedSpmv, ShardedSpmv2D
from .train import ShardedDiffSpmv, ShardedStreamDiffSpmv

__all__ = ["ShardedSpmv", "ShardedSpmv2D", "ShardedDiffSpmv",
           "ShardedStreamDiffSpmv"]
