#!/bin/bash
# Probe the tunneled TPU backend every 10 min; append status lines to
# /tmp/tunnel_status.log. Exits once a probe SUCCEEDS (so a driver/dev
# loop can `wait` on it), or after MAX_PROBES attempts.
MAX_PROBES=${MAX_PROBES:-60}
for i in $(seq 1 "$MAX_PROBES"); do
    out=$(timeout 120 env PYTHONPATH=/root/repo:/root/.axon_site python -c \
        "import jax; print(jax.devices())" 2>&1 | tail -1)
    if [[ "$out" == *"Tpu"* || "$out" == *"TPU"* || "$out" == *"axon"* ]]; then
        echo "$(date -u +%FT%TZ) UP $out" >> /tmp/tunnel_status.log
        exit 0
    fi
    echo "$(date -u +%FT%TZ) DOWN (probe $i)" >> /tmp/tunnel_status.log
    sleep 600
done
exit 1
