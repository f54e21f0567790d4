#!/bin/bash
# Round-4 TPU batch 6: measure the two unmeasured levers that landed after
# r4d — static Dirichlet-only skips (834d856) and the fused Neumann band
# step (b3fdff5) — plus the ELAINA_TRAIN_BATCHES=3 training-wall lever
# aimed at the guided_equal_time 256-budget win (<1.0).
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4f.log; }

log "spot parity equal-time, defaults (Dirichlet-skip re-measure)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out /tmp/parity_r4f_default.json > /tmp/r4f_parity_default.log 2>&1
log "parity_default rc=$?"
sleep 5

log "spot parity equal-time, ELAINA_TRAIN_BATCHES=3"
ELAINA_TRAIN_BATCHES=3 timeout 3000 python tools/tpu_parity.py --scene spot \
    --equal-time --out /tmp/parity_r4f_tb3.json > /tmp/r4f_parity_tb3.log 2>&1
log "parity_tb3 rc=$?"
sleep 5

log "neumann3d res 128 (fused band step)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 128 --spp 8 \
    --train-spp 2 > /tmp/r4f_neumann128.log 2>&1
log "neumann128 rc=$?"
sleep 5

log "neumann3d res 256 (lane occupancy)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 ELAINA_ITER_BUDGET=128 \
    timeout 3000 python bench.py --scene neumann3d --res 256 --spp 8 \
    --train-spp 2 > /tmp/r4f_neumann256.log 2>&1
log "neumann256 rc=$?"
sleep 5

log "headline bench, defaults (Dirichlet skips in)"
ELAINA_PHASE_DEBUG=1 timeout 3000 python bench.py \
    > /tmp/r4f_headline.log 2>&1
log "headline rc=$?"
log "ALL DONE"
