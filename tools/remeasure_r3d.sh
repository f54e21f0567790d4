#!/bin/bash
# Round-3 TPU batch 4: re-measure the full parity set with the
# knee-aware training-share policy + proportional shuffled budget
# quotas, then the queued 3D / Neumann / reference-scale rows.
# Keep the host CPU free while this runs (single core).
set -u
cd /root/repo

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r3d.log; }

log "spot parity (knee-aware train share)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/rm3d_parity.log 2>&1
log "parity rc=$?"
sleep 10

log "3D RMSE parity"
timeout 3600 python tools/tpu_parity3d.py > /tmp/rm3d_parity3d.log 2>&1
log "parity3d rc=$?"
sleep 10

log "neumann3d bench 256"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py \
    --scene neumann3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/rm3d_neumann.log 2>&1
log "neumann rc=$?"
log "bumpy3d bench 256 (Dirichlet-only comparator)"
timeout 3600 python bench.py --scene bumpy3d --res 256 --spp 64 \
    --train-spp 16 > /tmp/rm3d_bumpy256.log 2>&1
log "bumpy256 rc=$?"
sleep 10

log "reference-scale 1024^2"
timeout 3000 python tools/tpu_refscale.py > /tmp/rm3d_refscale.log 2>&1
log "refscale rc=$?"
log "ALL DONE"
