"""Multi-chip sharding: inference (mesh), multi-host (mesh), training
(train), GNN (gnn), and graph-app (apps) forms."""
from .apps import ShardedBFS, ShardedPageRank, ShardedSSSP
from .mesh import ShardedSpmv, ShardedSpmv2D, ShardedSpmvMultiHost
from .train import ShardedDiffSpmv, ShardedStreamDiffSpmv

__all__ = ["ShardedSpmv", "ShardedSpmv2D", "ShardedSpmvMultiHost",
           "ShardedDiffSpmv", "ShardedStreamDiffSpmv",
           "ShardedPageRank", "ShardedSSSP", "ShardedBFS"]
