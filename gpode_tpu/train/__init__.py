"""Training loop, metrics, configuration, and checkpointing."""
