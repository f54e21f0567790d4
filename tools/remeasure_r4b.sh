#!/bin/bash
# Round-4 TPU batch 2: the Dirichlet-only 3D rows + refscale (independent
# of the neumann3d per-iteration cost problem found in batch 1).
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4b.log; }

log "bumpy3d bench 256 (full protocol)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py \
    --scene bumpy3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/r4b_bumpy.log 2>&1
log "bumpy rc=$?"
sleep 5

log "refscale 1024^2 (SMEM gate)"
timeout 3600 python tools/tpu_refscale.py > /tmp/r4b_refscale.log 2>&1
log "refscale rc=$?"
sleep 5

log "parity3d"
timeout 3600 python tools/tpu_parity3d.py > /tmp/r4b_parity3d.log 2>&1
log "parity3d rc=$?"
log "ALL DONE"
