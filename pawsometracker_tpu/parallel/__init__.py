"""Multi-chip parallelism: device meshes, sharded tracking engines."""

from .mesh import ShardedBatchTracker, batch_sharding, global_detect_batch, make_mesh
