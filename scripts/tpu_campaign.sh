#!/bin/bash
# Round-2 TPU measurement campaign: hardware smokes for the two new
# kernels, then the chained benchmark points.  Each step is its own
# process (isolated crash domains); logs stream to /tmp/round2_campaign.log.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/ip_tpu_jax_cache

# Wait for a chip claim to become available (devices() blocks while the
# pool is busy).  Probe until one works — running the measurement steps
# against a dead tunnel just burns their timeouts (4h) for nothing — but
# bound the wait (~17h at 900s+120s per attempt) and EXIT on exhaustion
# instead of proceeding.
ok=0
for i in $(seq 1 60); do
  if timeout 900 python -u -c "
import jax, numpy as np, time
t0 = time.time()
print('devices', jax.devices(), flush=True)
print('d2h', np.asarray(jax.numpy.ones(8)*2.0)[:1], f'{time.time()-t0:.0f}s',
      flush=True)"; then
    ok=1; break
  fi
  echo "=== probe $i failed $(date); retrying in 120s"
  sleep 120
done
if [ "$ok" != 1 ]; then
  echo "=== chip never became claimable; aborting campaign $(date)"
  exit 1
fi
echo "=== chip up after $((i-1)) failed probes $(date)"

echo "=== stream smoke $(date)"
timeout 2700 python -u scripts/tpu_stream_smoke.py
echo "=== stream smoke exit=$? $(date)"

echo "=== socp smoke $(date)"
timeout 2700 python -u scripts/tpu_socp_smoke.py 1000
echo "=== socp smoke exit=$? $(date)"

echo "=== pd smoke $(date)"
timeout 2700 python -u scripts/tpu_pd_smoke.py 500 1000
echo "=== pd smoke exit=$? $(date)"

echo "=== measure $(date)"
timeout 9000 python -u scripts/tpu_round2_measure.py
echo "=== measure exit=$? $(date)"
echo "=== campaign done $(date)"
