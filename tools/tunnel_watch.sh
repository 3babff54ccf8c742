#!/bin/bash
# Probe the axon TPU tunnel every 90s; exit 0 the moment it answers.
for i in $(seq 1 200); do
  if timeout 90 python -c "
import jax; jax.config.update('jax_platforms', 'axon')
import jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128,128)); (x@x).block_until_ready()
print('TPU ALIVE', d)
" 2>/dev/null; then
    date
    exit 0
  fi
  sleep 30
done
exit 1
