"""Job plans: materialization, checkpointing, resume."""
