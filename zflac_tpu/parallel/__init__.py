"""Multi-chip / multi-host scaling: frame-parallel decode over a
jax.sharding.Mesh.

The reference is single-threaded (SURVEY.md §2.3); this package supplies
the parallelism the north star requires: frames sharded across devices
('dp' axis) via shard_map, long streams sharded across hosts at frame
granularity with boundary-offset exchange (the codec analog of context
parallelism), and XLA collectives for output assembly and global stats.
"""

from .shard import make_mesh, reconstruct_sharded  # noqa: F401
