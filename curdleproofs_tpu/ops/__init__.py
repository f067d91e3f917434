"""Device compute path: limb field kernels, G1 ops, MSM (JAX/XLA; Pallas for
the hot inner loops on real TPU).
"""
