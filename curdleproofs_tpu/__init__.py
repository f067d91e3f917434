"""curdleproofs_tpu: a TPU-native Curdleproofs zero-knowledge shuffle argument.

A from-scratch JAX/XLA/Pallas implementation of the Curdleproofs shuffle argument
over BLS12-381 (the proof system behind Ethereum's Whisk SSLE), bit-exact against
the Rust reference (`asn-d6/curdleproofs`) test vectors.

Layout:
- `host/`     — scalar host runtime: field/curve ints, Merlin transcript, StdRng clone
- `ops/`      — device math: limb field kernels, G1 ops, Pippenger MSM (JAX/Pallas)
- `parallel/` — multi-chip sharding: sharded MSM, batched verification over a Mesh
- protocol modules — transcript, commitments, sub-arguments, shuffle argument, whisk
"""

from .constants import N_BLINDERS  # noqa: F401

__version__ = "0.1.0"
