"""Hot-op kernels for the TPU engine (Pallas where warranted, specialized
XLA formulations elsewhere)."""
