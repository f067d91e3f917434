#!/bin/bash
# Round-4 device measurement chain: wait for the axon tunnel, then run the
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

# Every JSON artifact is written to a temp file and only moved into place
# after it parses as non-empty JSON — a timed-out/failed stage can no longer
# leave a zero-byte artifact in the repo (ADVICE r03: bench_hybrid_r03.json
# was committed empty because the shell redirect created it before bench.py
# wrote anything).
run_json() { # run_json <timeout_s> <artifact> <cmd...>
  local t="$1" out="$2"; shift 2
  local tmp="${out}.tmp"
  if timeout "$t" "$@" > "$tmp" 2>> "$LOG"; then
    if python -c "import json,sys; d=json.load(open('$tmp')); sys.exit(0 if d else 1)" 2>> "$LOG"; then
      mv "$tmp" "$out"
      echo "OK $out ($(wc -c < "$out") bytes)"
      return 0
    fi
  fi
  echo "STAGE FAILED: $out left untouched (see $LOG; partial: $tmp)" | tee -a "$LOG"
  return 1
}

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

# Stage order = value density: tune + AOT-export first (they make every
# later stage's numbers the warm-path numbers), then the headline protocol
# bench, then the probes, then the long sweeps.
if [ ! -s curdleproofs_tpu/ops/msm_tune.json ]; then
  echo "=== msm_autotune (table missing) ==="
  timeout 10800 python scripts/msm_autotune.py 2>> $LOG
fi

echo "=== aot_export (stream family + bench families, tuned params) ==="
timeout 7200 python scripts/aot_export.py 14 16 18 20 2>> $LOG

echo "=== full bench (hybrid backend) ==="
run_json 7200 bench_hybrid_r04.json python bench.py
tail -c 2000 bench_hybrid_r04.json 2>/dev/null

echo "=== cold start probe (fresh process; AOT blobs + warm XLA cache) ==="
run_json 3600 bench_cold_start.json python scripts/cold_start_probe.py

echo "=== sync floor probe (prover-offload floor arithmetic) ==="
run_json 1800 bench_sync_floor.json python scripts/sync_floor_probe.py

echo "=== msm sweep refresh (tuned params) ==="
timeout 9000 python scripts/msm_sweep.py 14 16 18 20 2>> $LOG

echo "CHAIN DONE $(date)"
touch /tmp/tpu_chain_done
