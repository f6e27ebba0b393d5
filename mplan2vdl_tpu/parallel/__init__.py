"""Multi-chip execution over a jax.sharding.Mesh.

The reference is single-process (SURVEY.md §2.3); everything here is new
TPU-native capability: tables row-sharded across devices, per-shard
compute via shard_map, XLA collectives (psum / all_gather) over ICI for
cross-chip aggregation."""
