#!/bin/bash
# Round-3 device measurement chain: wait for the axon tunnel, then run the
# full TPU measurement suite, landing every artifact inside the repo.
#
# Run it detached:  nohup bash scripts/tpu_chain.sh >> /tmp/tpu_chain.log 2>&1 &
# Progress markers: /tmp/tpu_alive (tunnel up), /tmp/tpu_chain_done (all done).
#
# One TPU process at a time (the axon tunnel degrades under concurrent
# clients); each stage is timeout-bounded so a wedged tunnel cannot hold
# the chain forever.
set -u
cd /root/repo
LOG=/tmp/tpu_chain.log
rm -f /tmp/tpu_alive /tmp/tpu_chain_done
echo "watcher start $(date)"

while true; do
  if timeout 600 python -c "
import jax
import jax.numpy as jnp, numpy as np
x = jnp.ones((8,8)) @ jnp.ones((8,8))
assert np.asarray(x).sum() == 512.0
print('tpu ok')
"; then
    break
  fi
  echo "probe failed $(date), retry in 300s"
  sleep 300
done
touch /tmp/tpu_alive
echo "TUNNEL ALIVE $(date) — starting chain"

# Stage order = value density: the hybrid protocol bench is the round's
# headline artifact and runs right after the cache warm; the long sweeps
# run last so a late tunnel recovery still lands the important numbers
# before any round-end process needs the chip.
echo "=== warm_cache ==="
timeout 3600 python scripts/warm_cache.py

echo "=== full bench (hybrid backend) ==="
timeout 7200 python bench.py > bench_hybrid_r03.json 2>> $LOG || true
tail -c 2000 bench_hybrid_r03.json

echo "=== cold start probe ==="
timeout 3600 python scripts/cold_start_probe.py > bench_cold_start.json 2>> $LOG || true
cat bench_cold_start.json

echo "=== msm sweep 14 16 (mixed-add + compressed uploads) ==="
timeout 5400 python scripts/msm_sweep.py 14 16

echo "=== msm sweep 18 20 ==="
timeout 9000 python scripts/msm_sweep.py 18 20

echo "CHAIN DONE $(date)"
touch /tmp/tpu_chain_done
