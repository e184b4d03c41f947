"""Native (C++) host helpers, loaded lazily through ctypes.

The TPU compute path is JAX/XLA/Pallas; these cover the few genuinely
sequential host algorithms (monotonic-stack rectangle search, greedy
corner suppression) where vectorization has no purchase.  Everything
degrades gracefully to the numpy implementations when a compiler is
unavailable.
"""
