"""Ray Data stages: stateless map_batches functions + actor-pool classes."""
