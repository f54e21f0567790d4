#!/bin/bash
# Round-4 TPU batch 7 (r4g): the batch-6 rows that didn't land before the
# session ended — neumann3d fused-band re-measures at res 128 and 256, and
# the headline bench with the Dirichlet-only skips in.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4g.log; }

log "neumann3d res 128 (fused band step)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 8 \
    --train-spp 2 > /tmp/r4g_neumann128.log 2>&1
log "neumann128 rc=$?"
sleep 5

log "neumann3d res 256 (lane occupancy)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 256 --spp 8 \
    --train-spp 2 > /tmp/r4g_neumann256.log 2>&1
log "neumann256 rc=$?"
sleep 5

log "headline bench, defaults (Dirichlet skips in)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py \
    > /tmp/r4g_headline.log 2>&1
log "headline rc=$?"
log "ALL DONE"
