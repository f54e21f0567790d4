#!/bin/bash
# Round-4 TPU batch 1: land the numbers round 3 stranded (VERDICT r3 #1)
# on the HONEST protocol (bench.py now defaults to no time budget).
# Keep the host CPU free while this runs (single core).
set -u
cd /root/repo

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4a.log; }

log "headline bench (full protocol, no budget)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py > /tmp/r4a_headline.log 2>&1
log "headline rc=$?"
sleep 5

log "spot parity (equal-time, 32-spp-target fix validation)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/r4a_parity.log 2>&1
log "parity rc=$?"
sleep 5

log "bumpy3d bench 256 (full protocol)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py \
    --scene bumpy3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/r4a_bumpy.log 2>&1
log "bumpy rc=$?"
sleep 5

log "neumann3d bench 256 (bounded dispatches)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3600 python bench.py --scene neumann3d --res 256 --spp 16 \
    --train-spp 4 > /tmp/r4a_neumann.log 2>&1
log "neumann rc=$?"
sleep 5

log "refscale 1024^2 (SMEM gate)"
timeout 3600 python tools/tpu_refscale.py > /tmp/r4a_refscale.log 2>&1
log "refscale rc=$?"
sleep 5

log "parity3d"
timeout 3600 python tools/tpu_parity3d.py > /tmp/r4a_parity3d.log 2>&1
log "parity3d rc=$?"
sleep 5

log "sil probe (neumann per-query cost isolation)"
timeout 1500 python tools/tpu_sil_probe.py > /tmp/r4a_silprobe.log 2>&1
log "silprobe rc=$?"
log "ALL DONE"
