#!/bin/bash
# Round-5 TPU batch G: validate ELAINA_GRAD_CLIP=0.5 as the default.
# Batch-F result: clip improves BOTH the bad seed (0.993 -> 0.706) and
# the good seed (0.763 -> 0.692) at the 256/64 budget.  Before flipping
# the default: all 5 seeds x both budgets, and the 3D guided parity row.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5g.log; }

log "clip=0.5 full seed sweep (5 seeds x 256,64 budgets)"
ELAINA_GRAD_CLIP=0.5 timeout -k 60 6000 python tools/tpu_variance.py \
    --seeds 0,1,2,3,4 --budgets 256,64 \
    --out /root/repo/BENCH_variance_clip.json > /tmp/r5g_varclip.log 2>&1
log "varclip rc=$?"
sleep 5

log "clip=0.5 3D check (parity3d guided vs analytic)"
ELAINA_GRAD_CLIP=0.5 timeout -k 60 3000 python tools/tpu_parity3d.py \
    > /tmp/r5g_parity3d.log 2>&1
log "parity3d rc=$?"
log "G ALL DONE"
