"""Multi-chip sharding (mesh/pjit/shard_map)."""
