#!/bin/bash
# Chain watcher: waits for the MAIN sweep queue (tools/tpu_sweep.sh, 25
# sections, driven by tools/tpu_watch.sh) to finish, then drives the
# round-5 follow-up queue (tools/tpu_sweep_r5.sh: pair-sort A/B,
# re-measured big/zoo timing-fence entries, winner profile) with the
# same probe-until-alive protocol. Safe to leave running in tmux.
cd /root/repo
WLOG=/tmp/tpu_watch_r5.log
DONE=data/sweep_logs/sections_done
MAIN_TOTAL=25
R5_SECTIONS="perm_bench e2e_r5_base e2e_r5_pairsort e2e_r5_permgather e2e_r5_permgather1 e2e_r5_pair_gather big_r5_481k zoo_r5 profile_r5_pair golden_fullzoo zoo_parity golden_floors goldens_check_r5"

r5_remaining() {
  local n=0 s
  for s in $R5_SECTIONS; do grep -qx "$s" "$DONE" 2>/dev/null || n=$((n+1)); done
  echo $n
}

while true; do
  if [ "$(r5_remaining)" -eq 0 ]; then
    echo "$(date) all r5 sections done — chain watcher exiting" | tee -a $WLOG
    break
  fi
  # Don't contend with the main sweep: wait until its 25 sections are done
  # AND no sweep process is live (final_bench isn't a section until marked).
  if [ ! -f "$DONE" ] || [ "$(wc -l < $DONE)" -lt "$MAIN_TOTAL" ] \
     || [ -n "$(ps -eo args | grep '^bash tools/tpu_sweep.sh' | grep -v grep)" ]; then
    sleep 120
    continue
  fi
  # Two-stage probe (PERF.md half-warm finding): fast devices() check,
  # then a compiled matmul with >=600 s allowance for post-wedge warm-up.
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
    echo "$(date) TPU alive — starting r5 queue ($(r5_remaining) sections left)" | tee -a $WLOG
    bash tools/tpu_sweep_r5.sh
    rc=$?
    echo "$(date) r5 pass finished rc=$rc" | tee -a $WLOG
    [ $rc -eq 99 ] && sleep 300
  else
    echo "$(date) TPU still wedged; sleeping 300s" >> $WLOG
    sleep 300
  fi
done
