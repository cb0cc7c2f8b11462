#!/bin/bash
# Drain /tmp/tpuq/spool serially once the axon tunnel is alive.
# Single TPU client rule: nothing else may touch the tunnel while this runs.
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
# The axon plugin NEEDS these two (learned live: unsetting them kills
# plugin discovery -> silent CPU fallback on every probe):
export JAX_PLATFORMS=axon
export PYTHONPATH=/root/.axon_site

log() { echo "$(date '+%F %T') $*" >> /tmp/tpuq/drain.log; }

probe() {
  # Success requires a REAL non-CPU device: when the axon plugin fails
  # to init, JAX silently falls back to CpuDevice and every queued job
  # would record host timings as device rows.
  timeout 300 python -c "
import jax, jax.numpy as jnp
d = jax.devices()[0]
assert d.platform != 'cpu', f'CPU fallback: {d}'
print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()), jax.devices())
" >> /tmp/tpuq/probe.log 2>&1
}

log "drainer started (pid $$)"
while true; do
  until probe; do
    log "tunnel down; sleeping 120s"
    sleep 120
  done
  job=$(ls /tmp/tpuq/spool/*.job 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    log "spool empty — drainer exiting"
    break
  fi
  name=$(basename "$job")
  log "RUN $name"
  if timeout 5400 bash "$job" >> "/tmp/tpuq/out_${name}.log" 2>&1; then
    mv "$job" "/tmp/tpuq/done_${name}"
    log "OK $name"
  else
    rc=$?
    fails_file="/tmp/tpuq/fails_${name}"
    fails=$(( $(cat "$fails_file" 2>/dev/null || echo 0) + 1 ))
    echo "$fails" > "$fails_file"
    log "FAIL rc=$rc attempt=$fails $name"
    if [ "$fails" -ge 3 ]; then
      mv "$job" "/tmp/tpuq/failed_${name}"
      log "GIVEUP $name"
    fi
    sleep 30
  fi
done
