"""Training layer: losses, optimizers/schedules, train steps, checkpointing."""
