#!/bin/bash
# Round-4 TPU batch 8 (r4h): re-run the r4g rows after the fused-band
# Mosaic lowering fix (mixed-index gather + 15-way concat both rejected on
# real TPU) and the lane-oversubscription lever (3D slice scenes widen
# 16k -> 64k lanes).  The r4g headline (9.54M) was measured while the
# builder was editing on the single-core host — re-measure idle.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4h.log; }

log "headline bench, defaults (Dirichlet skips; idle host)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py \
    > /tmp/r4h_headline.log 2>&1
log "headline rc=$?"
sleep 5

log "neumann3d res 128 (fused band + oversubscription 16k -> 64k lanes)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 8 \
    --train-spp 2 > /tmp/r4h_neumann128.log 2>&1
log "neumann128 rc=$?"
sleep 5

log "neumann3d res 256 (lane occupancy at native width)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 256 --spp 8 \
    --train-spp 2 > /tmp/r4h_neumann256.log 2>&1
log "neumann256 rc=$?"
log "ALL DONE"
