"""Training: sharded train state, pjit train step, loops, metrics,
checkpointing."""
