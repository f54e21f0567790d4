#!/bin/bash
# Round-5 TPU batch B: (1) fresh SAME-RUN spot parity table for the
# honest README numbers (VERDICT r4 #6), (2) neumann3d steady-state rate
# at production spp (the spp=8 batch-A row is fixed-cost dominated),
# (3) neumann3d quality rows — the first measured quality numbers with
# the reflection folding compiled IN (VERDICT r4 #5), (4) uniform 1024²
# at 64 spp to amortize the per-process executable load (VERDICT r4 #4).
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5b.log; }

log "spot parity, full equal-time table (same-run README numbers)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    > /tmp/r5b_parity.log 2>&1
log "parity rc=$?"
sleep 5

log "neumann3d res 128 spp 64/16 (steady-state rate)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=256 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 64 \
    --train-spp 16 > /tmp/r5b_neumann64.log 2>&1
log "neumann64 rc=$?"
sleep 5

log "neumann3d quality (GT 1024 + equal-spp + equal-time)"
timeout 3000 python tools/tpu_neumann_quality.py --res 128 --gt-spp 1024 \
    --spp 64 --equal-time > /tmp/r5b_nquality.log 2>&1
log "nquality rc=$?"
sleep 5

log "uniform 1024^2 spp 64 (amortized executable load)"
ELAINA_BALANCE_DEBUG=1 timeout 3000 python tools/tpu_refscale.py \
    --spp 64 --guided-spp 0 > /tmp/r5b_refscale_u.log 2>&1
log "refscale_u rc=$?"
log "ALL DONE"
