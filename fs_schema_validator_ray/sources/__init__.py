"""Sources: clips table readers + deterministic synthetic generators."""
