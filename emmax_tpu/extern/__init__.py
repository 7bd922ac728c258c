"""External-surface facades (HF-hub-style API compatibility)."""
