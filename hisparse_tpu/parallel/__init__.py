"""Multi-chip sharding: inference (mesh) and training (train) forms."""
from .mesh import ShardedSpmv, ShardedSpmv2D
from .train import ShardedDiffSpmv

__all__ = ["ShardedSpmv", "ShardedSpmv2D", "ShardedDiffSpmv"]
