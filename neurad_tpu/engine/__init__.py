"""Training engine: optimizers, schedulers, trainer, checkpointing."""
