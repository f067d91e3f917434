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

__version__ = "0.2.0"


def __getattr__(name):
    """Lazy top-level API (importing jax/the native lib only when used)."""
    if name in ("CurdleproofsProof", "generate_crs"):
        from . import curdleproofs as _m

        return getattr(_m, name)
    if name == "CurdleproofsCrs":
        from .crs import CurdleproofsCrs

        return CurdleproofsCrs
    if name in ("WhiskTracker", "generate_whisk_shuffle_proof",
                "is_valid_whisk_shuffle_proof", "is_valid_whisk_shuffle_proofs",
                "generate_whisk_tracker_proof",
                "is_valid_whisk_tracker_proof",
                "is_valid_whisk_tracker_proofs"):
        from . import whisk as _m

        return getattr(_m, name)
    if name == "StdRng":
        from .host.rng import StdRng

        return StdRng
    raise AttributeError(name)
