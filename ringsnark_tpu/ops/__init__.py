"""Low-level compute ops: modular arithmetic, NTT, Pallas kernels."""
