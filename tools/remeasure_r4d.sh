#!/bin/bash
# Round-4 TPU batch 4: bf16-encoding A/B, floor-24 fresh-run validation,
# neumann3d on the triplane encoding.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4d.log; }

log "spot parity bf16 encoding"
ELAINA_ENC_BF16=1 timeout 3000 python tools/tpu_parity.py --scene spot \
    --equal-time --out /tmp/parity_bf16.json > /tmp/r4d_parity_bf16.log 2>&1
log "parity_bf16 rc=$?"
sleep 5

log "fresh-hints bumpy3d guided (floor-24 spiral fix validation)"
mkdir -p /tmp/hints_stash && mv /root/repo/.cache/hints_*.npz /tmp/hints_stash/ 2>/dev/null
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3000 python bench.py \
    --scene bumpy3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/r4d_bumpy_fresh.log 2>&1
log "bumpy_fresh rc=$?"
cp -n /tmp/hints_stash/*.npz /root/repo/.cache/ 2>/dev/null
sleep 5

log "neumann3d bench (triplane + band grid)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 8 \
    --train-spp 2 > /tmp/r4d_neumann.log 2>&1
log "neumann rc=$?"
sleep 5

log "headline bench bf16 encoding"
ELAINA_PHASE_DEBUG=1 ELAINA_ENC_BF16=1 timeout 3000 python bench.py \
    > /tmp/r4d_headline_bf16.log 2>&1
log "headline_bf16 rc=$?"
log "ALL DONE"
