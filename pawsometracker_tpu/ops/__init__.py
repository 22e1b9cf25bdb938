"""Device-side ops: kernel construction, filtering primitives, Pallas kernels."""
