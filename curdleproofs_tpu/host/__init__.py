"""Host-side runtime: scalar field/curve math, transcripts, RNG, codecs.

This layer is latency-optimal Python (C++ acceleration hooks live in
`curdleproofs_tpu.host.native` once built); all O(n) vector math belongs in
`curdleproofs_tpu.ops` (JAX/Pallas device path).
"""

from . import field, g1, keccak, rng, serde, strobe  # noqa: F401
from .g1 import G1, GENERATOR, INFINITY  # noqa: F401
from .rng import StdRng  # noqa: F401
from .strobe import MerlinTranscript  # noqa: F401
