"""Multi-chip / multi-host scaling: mesh construction and sharded search
steps. Replaces the reference's pthreads + TCP fan-out (`bsgsd_client.py`)
with `jax.sharding.Mesh` + `shard_map` and XLA collectives over ICI."""
