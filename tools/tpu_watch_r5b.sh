#!/bin/bash
# Chain watcher: waits for tools/tpu_sweep_r5.sh to finish (all its
# sections in the done-file), then drives tools/tpu_sweep_r5b.sh
# (verification repeats of the 28.21 pair_gather reading, standalone-
# gather crash stderr, default+candidate profiles, final bench) with
# the same probe-until-alive protocol.
cd /root/repo
WLOG=/tmp/tpu_watch_r5b.log
DONE=data/sweep_logs/sections_done
R5_SECTIONS="perm_bench e2e_r5_base e2e_r5_pairsort e2e_r5_permgather e2e_r5_permgather1 e2e_r5_pair_gather big_r5_481k zoo_r5 profile_r5_pair golden_fullzoo zoo_parity golden_floors goldens_check_r5"
R5B_SECTIONS="e2e_r5_pair_gather_v2 e2e_r5_pair_gather_v3 e2e_r5_base_v2 e2e_r5_permgather_err profile_r5_default profile_r5_pair_gather zoo_parity_mk final_bench_r5"

remaining() {
  local n=0 s
  for s in $1; do grep -qx "$s" "$DONE" 2>/dev/null || n=$((n+1)); done
  echo $n
}

while true; do
  if [ "$(remaining "$R5B_SECTIONS")" -eq 0 ]; then
    echo "$(date) all r5b sections done — exiting" | tee -a $WLOG
    break
  fi
  # wait for the r5 queue to drain and no sweep process to be live
  if [ "$(remaining "$R5_SECTIONS")" -gt 0 ] \
     || [ -n "$(ps -eo args | grep '^bash tools/tpu_sweep' | grep -v grep)" ]; then
    sleep 120
    continue
  fi
  # two-stage probe (PERF.md half-warm finding)
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
    echo "$(date) TPU alive — starting r5b queue ($(remaining "$R5B_SECTIONS") sections left)" | tee -a $WLOG
    bash tools/tpu_sweep_r5b.sh
    rc=$?
    echo "$(date) r5b pass finished rc=$rc" | tee -a $WLOG
    [ $rc -eq 99 ] && sleep 300
  else
    echo "$(date) TPU still wedged; sleeping 300s" >> $WLOG
    sleep 300
  fi
done
