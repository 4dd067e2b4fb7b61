#!/bin/bash
# Probe the TPU in fresh bounded processes until the axon tunnel answers,
# then run the (resumable) sweep queue. Keeps going until EVERY sweep
# section is done — a mid-sweep re-wedge just sends us back to probing.
# Safe to leave running in tmux — never touches a wedged plugin from a
# long-lived process.
cd /root/repo
WLOG=/tmp/tpu_watch.log
DONE=data/sweep_logs/sections_done
TOTAL=25   # sections in tools/tpu_sweep.sh
while true; do
  if [ -f "$DONE" ] && [ "$(wc -l < $DONE)" -ge "$TOTAL" ]; then
    echo "$(date) all $TOTAL sweep sections done — watcher exiting" | tee -a $WLOG
    break
  fi
  # Two-stage probe (PERF.md round-4 "half-warm" finding): devices() is a
  # fast liveness check, but the FIRST compiled program after a wedge can
  # take ~415 s of one-time warm-up — a short combined probe kills that
  # warm-up and misreads half-warm as wedged forever. Stage 2 gets >=600 s.
  if timeout 180 python - >>$WLOG 2>&1 <<'EOF' \
     && timeout 700 python - >>$WLOG 2>&1 <<'EOF2'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("TPU devices OK:", d)
EOF
import jax, time
t0 = time.time()
import jax.numpy as jnp
x = jnp.ones((8, 128)) @ jnp.ones((128, 8))
assert float(x[0, 0]) == 128.0
print(f"TPU matmul OK ({time.time()-t0:.0f}s warm-up)")
EOF2
  then
    echo "$(date) TPU alive — starting sweep ($( [ -f $DONE ] && wc -l < $DONE || echo 0 )/$TOTAL sections done)" | tee -a $WLOG
    bash tools/tpu_sweep.sh
    rc=$?
    echo "$(date) sweep pass finished rc=$rc" | tee -a $WLOG
    [ $rc -eq 99 ] && sleep 300   # re-wedged mid-sweep: back to probing
  else
    echo "$(date) TPU still wedged; sleeping 300s" >> $WLOG
    sleep 300
  fi
done
