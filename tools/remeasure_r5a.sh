#!/bin/bash
# Round-5 TPU batch A: (1) headline on the drain-to-completion protocol
# (VERDICT r4 #9 — no "interrupted" rescale), (2) the stranded r4h rows:
# neumann3d res 128/256 with the fused band kernel + lane
# oversubscription (VERDICT r4 #2), (3) 1024² refscale with the new
# lane-width cap keeping the compacted resolve on (VERDICT r4 #4).
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5a.log; }

log "headline bench, defaults (full drain; idle host)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py > /tmp/r5a_headline.log 2>&1
log "headline rc=$?"
sleep 5

log "neumann3d res 128 (fused band + oversubscription)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 8 \
    --train-spp 2 > /tmp/r5a_neumann128.log 2>&1
log "neumann128 rc=$?"
sleep 5

log "neumann3d res 256 (native width)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 256 --spp 8 \
    --train-spp 2 > /tmp/r5a_neumann256.log 2>&1
log "neumann256 rc=$?"
sleep 5

log "refscale 1024^2 (lane cap 384k: compacted resolve stays on)"
ELAINA_BALANCE_DEBUG=1 timeout 3000 python tools/tpu_refscale.py \
    --spp 32 --guided-spp 64 > /tmp/r5a_refscale.log 2>&1
log "refscale rc=$?"
log "ALL DONE"
