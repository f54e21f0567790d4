#!/bin/bash
# Round-4 TPU batch 5: COMBINED levers (bf16 encoding + train_every=20)
# aimed at the guided_equal_time 256-budget win (<1.0), plus the headline
# on the combined knobs.  Run after r4c/r4d A/Bs confirm RMSE parity.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r4e.log; }

log "spot parity bf16+te20 combined"
ELAINA_ENC_BF16=1 ELAINA_TRAIN_EVERY=20 timeout 3000 \
    python tools/tpu_parity.py --scene spot --equal-time \
    --out /tmp/parity_combined.json > /tmp/r4e_parity.log 2>&1
log "parity_combined rc=$?"
sleep 5

log "headline bench bf16+te20 combined"
ELAINA_PHASE_DEBUG=1 ELAINA_ENC_BF16=1 ELAINA_TRAIN_EVERY=20 timeout 3000 \
    python bench.py > /tmp/r4e_headline.log 2>&1
log "headline_combined rc=$?"
log "ALL DONE"
