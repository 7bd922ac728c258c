"""Model definitions (vision towers, LLM decoder, projector, VLM/VLA)."""
