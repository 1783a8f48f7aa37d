#!/bin/bash
# Run a command wrapped in a CPU-steal probe (round-10 measurement
# protocol, see OPTIMIZATION_r10.md): prints STEAL_PCT and BUSY_PCT
# deltas from /proc/stat over the run so A/B decisions can discard
# high-steal windows. Usage: tools/steal_probe.sh <cmd...>
read -r _ u0 n0 s0 i0 w0 irq0 sirq0 st0 _ < /proc/stat
t0=$(date +%s.%N)
"$@"
rc=$?
t1=$(date +%s.%N)
read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
du=$((u1-u0)); ds=$((s1-s0)); di=$((i1-i0)); dw=$((w1-w0)); dst=$((st1-st0))
tot=$((du+ds+di+dw+dst+(n1-n0)+(irq1-irq0)+(sirq1-sirq0)))
awk -v st="$dst" -v busy="$((du+ds))" -v tot="$tot" -v wall="$(echo "$t1 $t0" | awk '{print $1-$2}')" \
  'BEGIN { printf "[probe] WALL=%.1fs STEAL_PCT=%.1f BUSY_PCT=%.1f\n", wall, 100*st/tot, 100*busy/tot }' >&2
exit $rc
