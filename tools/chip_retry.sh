#!/bin/bash
# chip_retry.sh <marker-string> <logfile> -- cmd args...
# Runs cmd up to 5 times until its logfile contains the marker (the
# tunnel can flap mid-run and hang the PJRT client forever; a fresh
# process + warm XLA cache restarts cheaply). Waits for the tunnel
# to answer before each attempt.
MARKER="$1"; LOG="$2"; shift 3
for attempt in 1 2 3 4 5; do
  # wait (up to 30 min) for the tunnel
  for i in $(seq 1 60); do
    timeout 60 python -c "
import jax; jax.config.update('jax_platforms','axon')
import jax.numpy as jnp
(jnp.ones((8,8))@jnp.ones((8,8))).block_until_ready()" 2>/dev/null && break
    sleep 30
  done
  echo "[chip_retry] attempt $attempt: $*" >&2
  timeout 2700 "$@" >> "$LOG" 2>&1
  if grep -q "$MARKER" "$LOG"; then
    echo "[chip_retry] success on attempt $attempt" >&2
    exit 0
  fi
done
echo "[chip_retry] FAILED after 5 attempts" >&2
exit 1
