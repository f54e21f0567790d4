#!/bin/bash
# Round-4 TPU batch 3: triplane-3D A/B + train-cadence A/B.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4c.log; }

log "parity3d (triplane encoding)"
timeout 3000 python tools/tpu_parity3d.py > /tmp/r4c_parity3d.log 2>&1
log "parity3d rc=$?"
sleep 5

log "bumpy3d bench (triplane)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py --scene bumpy3d \
    --res 256 --spp 64 --train-spp 16 > /tmp/r4c_bumpy.log 2>&1
log "bumpy rc=$?"
sleep 5

log "spot parity te=20"
ELAINA_TRAIN_EVERY=20 timeout 3000 python tools/tpu_parity.py --scene spot \
    --equal-time --out /tmp/parity_te20.json > /tmp/r4c_parity20.log 2>&1
log "parity20 rc=$?"
sleep 5

log "headline bench te=20"
ELAINA_PHASE_DEBUG=1 ELAINA_TRAIN_EVERY=20 timeout 3000 python bench.py \
    > /tmp/r4c_headline20.log 2>&1
log "headline20 rc=$?"
log "ALL DONE"
