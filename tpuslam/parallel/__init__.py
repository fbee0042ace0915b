"""Device-mesh scaling: sharded batched matching and mapping."""
