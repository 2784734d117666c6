"""Training subsystem: train state, jitted sharded steps, loop, checkpoints."""
