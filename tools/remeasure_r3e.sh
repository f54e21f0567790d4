#!/bin/bash
# Round-3 TPU batch 5: validate the budgeted-training fixes (slicer
# epoch + tail gate), re-measure the parity set, then the still-missing
# 3D rows (bumpy3d bench, neumann3d with watchdog-bounded dispatches,
# refscale after the SMEM gate, parity3d).
# Keep the host CPU free while this runs (single core).
set -u
cd /root/repo

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r3e.log; }

log "sil probe (neumann per-query cost isolation)"
timeout 1500 python tools/tpu_sil_probe.py > /tmp/r3e_silprobe.log 2>&1
log "silprobe rc=$?"
sleep 5

log "budget repro (training-fix validation, debug on)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 1800 \
    python tools/tpu_budget_repro.py > /tmp/r3e_budget.log 2>&1
log "budget rc=$?"
sleep 5

log "spot parity (equal-time)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/r3e_parity.log 2>&1
log "parity rc=$?"
sleep 5

log "bumpy3d bench 256"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py \
    --scene bumpy3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/r3e_bumpy.log 2>&1
log "bumpy rc=$?"
sleep 5

log "neumann3d bench 256 (bounded dispatches)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3600 python bench.py --scene neumann3d --res 256 --spp 16 \
    --train-spp 4 > /tmp/r3e_neumann.log 2>&1
log "neumann rc=$?"
sleep 5

log "refscale 1024^2 (SMEM gate)"
timeout 3600 python tools/tpu_refscale.py > /tmp/r3e_refscale.log 2>&1
log "refscale rc=$?"
sleep 5

log "parity3d"
timeout 3600 python tools/tpu_parity3d.py > /tmp/r3e_parity3d.log 2>&1
log "parity3d rc=$?"
log "ALL DONE"
