"""Parallelism layer: device meshes, batched envs (DP), spatial sharding (SP).

The reference is single-process/single-device (SURVEY.md §2.3); its scaling
axes map TPU-natively to:
  * per-actuator agent replication  -> a batched matmul (already in models/)
  * data parallel                   -> vmap over env batches + pjit sharding
  * spatial                         -> shard_map over a chip mesh with
                                       collective-based distributed FFT and
                                       ppermute halo exchange
"""
