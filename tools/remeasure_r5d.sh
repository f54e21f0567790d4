#!/bin/bash
# Round-5 TPU batch D: the fille reference protocol (66k segments, depth
# 128 — VERDICT r4 missing #3), a good-seed same-run parity table under
# pinned structure (both equal-time squeeze directions with a
# locked-on guide), and the bimodal-training seed diagnostics.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5d.log; }

log "fille u.json protocol (uniform 1024 spp, depth 128)"
timeout 6000 python tools/tpu_refprotocol.py --phase u --scene fille \
    > /tmp/r5d_fille_u.log 2>&1
log "fille_u rc=$?"
sleep 5

log "fille n.json protocol (guided 1024/256, depth 128)"
timeout 6000 python tools/tpu_refprotocol.py --phase n --scene fille \
    > /tmp/r5d_fille_n.log 2>&1
log "fille_n rc=$?"
sleep 5

log "fille GT (uniform 2048 spp — deviation from 65,536 documented)"
timeout 10000 python tools/tpu_refprotocol.py --phase gt --scene fille \
    --gt-spp 2048 > /tmp/r5d_fille_gt.log 2>&1
log "fille_gt rc=$?"
sleep 5

log "fille rescore (RMSE vs the finished GT)"
timeout 600 python tools/tpu_refprotocol.py --phase rescore --scene fille \
    > /tmp/r5d_fille_rescore.log 2>&1
log "rescore rc=$?"
sleep 5

log "good-seed same-run parity (det mode, seed 3)"
ELAINA_DETERMINISTIC=1 ELAINA_SEED=3 timeout 3000 \
    python tools/tpu_parity.py --scene spot --equal-time \
    --out /root/repo/BENCH_parity_seed3.json > /tmp/r5d_parity_s3.log 2>&1
log "parity_s3 rc=$?"
sleep 5

log "seed diagnostics (bad seed 0 vs good seed 1)"
timeout 3000 python tools/tpu_seed_diag.py --seeds 0,1 \
    > /tmp/r5d_seeddiag.log 2>&1
log "seeddiag rc=$?"
log "ALL DONE"
