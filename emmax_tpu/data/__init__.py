"""Data pipeline: GCOT datasets, collators, RLDS loading, frame sources."""
