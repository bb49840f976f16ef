#!/bin/bash
# Measurement matrix for the r3 bench regression (VERDICT r3 item 1):
# driver heap x periodicGC interval, each a fresh JVM running the
# driver-shaped harness (bench.py) at sf0.1. Prints one line per config.
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_matrix.out}
: > "$OUT"
for cfg in "1g:" "2g:" "4g:" "4g:45s" "8g:" "16g:" "16g:45s"; do
  mem="${cfg%%:*}"; gc="${cfg##*:}"
  for rep in 1 2; do
    t0=$(date +%s.%N)
    line=$(SPARK_DRIVER_MEMORY="$mem" SPARK_GRAFT_PERIODIC_GC="$gc" \
      python bench.py 2>/dev/null | tail -1)
    t1=$(date +%s.%N)
    wall=$(echo "$t1 $t0" | awk '{printf "%.1f", $1-$2}')
    echo "mem=$mem gc=${gc:-default} rep=$rep wall=${wall}s $line" >> "$OUT"
  done
done
echo MATRIX_DONE >> "$OUT"
