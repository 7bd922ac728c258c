"""TPU compute ops: norms, RoPE, attention (XLA reference + Pallas kernels),
image preprocessing."""
