#!/bin/bash
# Probe the TPU in fresh bounded processes until the axon tunnel answers,
# then run the sweep queue. Safe to leave running in tmux — never touches
# a wedged plugin from a long-lived process.
cd /root/repo
WLOG=/tmp/tpu_watch.log
while true; do
  if timeout 180 python - >>$WLOG 2>&1 <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
import jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(x[0, 0]) == 128.0
print("TPU OK:", d)
EOF
  then
    echo "$(date) TPU alive — starting sweep" | tee -a $WLOG
    bash tools/tpu_sweep.sh
    echo "$(date) sweep finished" | tee -a $WLOG
    break
  fi
  echo "$(date) TPU still wedged; sleeping 300s" >> $WLOG
  sleep 300
done
