#!/bin/bash
# Drive scripts/tpu_breakdown.py one tag per subprocess with a timeout
# and one retry: large fresh remote compiles through the axon tunnel
# occasionally hang forever (observed round 5); a hang must not cost
# the other tags.  Usage: run_breakdown_resilient.sh [out.log]
OUT=${1:-/tmp/breakdown_r05.log}
cd "$(dirname "$0")/.."
: > "$OUT"
for tag in pallas_blocked mixed f32accum mixed_fused mixed_pallas f64; do
  for attempt in 1 2; do
    echo "# tag=$tag attempt=$attempt" >> "$OUT"
    timeout -k 10 1500 python scripts/tpu_breakdown.py "$tag" >> "$OUT" 2>&1
    rc=$?
    echo "# tag=$tag attempt=$attempt rc=$rc" >> "$OUT"
    [ $rc -eq 0 ] && break
    sleep 20
  done
done
echo "# all done" >> "$OUT"
