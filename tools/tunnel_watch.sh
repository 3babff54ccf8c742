#!/bin/bash
# Probe the tunneled TPU backend every 10 min; append status lines to
# /tmp/tunnel_status.log. A probe only counts as UP when a real device
# compute + D2H round-trip completes (device enumeration alone can hang
# or emit warnings that look like device names). Exits once a probe
# SUCCEEDS, or after MAX_PROBES attempts.
MAX_PROBES=${MAX_PROBES:-60}
for i in $(seq 1 "$MAX_PROBES"); do
    out=$(timeout 240 env PYTHONPATH=/root/repo:/root/.axon_site python -c "
import jax, jax.numpy as jnp
d = jax.devices()
v = float(jnp.arange(8.0).sum())
assert v == 28.0
print('PROBE_OK', d[0], d[0].platform)
" 2>&1 | grep PROBE_OK)
    if [[ -n "$out" ]]; then
        echo "$(date -u +%FT%TZ) UP $out" >> /tmp/tunnel_status.log
        exit 0
    fi
    echo "$(date -u +%FT%TZ) DOWN (probe $i)" >> /tmp/tunnel_status.log
    sleep 600
done
exit 1
