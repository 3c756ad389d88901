"""Cross-cutting utilities: time grids, meters, logging, checkpointing, config."""
