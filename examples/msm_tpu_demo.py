"""Device-MSM quick tour: resident bases, the one-call pipeline, a mesh.

Run on hardware:   CURDLEPROOFS_TPU_REAL=1 python examples/msm_tpu_demo.py
On CPU (testing):  python examples/msm_tpu_demo.py     (virtual 8-dev mesh)
"""

import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/curdleproofs_jax_cache")
if not os.environ.get("CURDLEPROOFS_TPU_REAL"):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

from curdleproofs_tpu.constants import R
from curdleproofs_tpu.host.rng import StdRng
from curdleproofs_tpu.ops.msm_device import msm_device, prepare_bases
from curdleproofs_tpu.parallel.sharded_msm import make_msm_mesh, sharded_msm

n = 1 << 14 if os.environ.get("CURDLEPROOFS_TPU_REAL") else 64
rng = StdRng.seed_from_u64(0)
rnd = random.Random(0)
points = [rng.rand_g1() for _ in range(min(n, 4096))]
points = (points * (-(-n // len(points))))[:n]
scalars = [rnd.randrange(R) for _ in range(n)]

# 1. upload the bases ONCE (the expensive part over a slow host link) ...
bases = prepare_bases(points)
# 2. ... then every MSM is one jitted device program + a 32 B/scalar upload
msm_device(bases, scalars)  # compile + warm
t0 = time.perf_counter()
result = msm_device(bases, scalars)
print(f"single-chip MSM of 2^{n.bit_length()-1}: "
      f"{(time.perf_counter()-t0)*1e3:.1f} ms -> {result.to_affine()[0]:#x}"[:100])

# 3. the same pipeline over a points x windows mesh (data + tensor parallel)
mesh = make_msm_mesh(n_window_shards=2) if len(
    __import__("jax").devices()) >= 2 else make_msm_mesh()
sharded = sharded_msm(points, scalars, mesh)
assert sharded == result
print(f"sharded over mesh {mesh.devices.shape}: identical result")
