#!/bin/bash
# Round-5 TPU batch E: ladybug n.json retry (the 02:23 attempt hit a
# tunnel wedge that survived SIGTERM — all timeouts now -k enforced),
# then the fille protocol, the good-seed parity table, and the seed
# diagnostics.  Ordered most-valuable-first in case the round clock or
# another wedge cuts the tail.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5e.log; }

log "ladybug n.json protocol retry (guided 1024/256)"
ELAINA_PHASE_DEBUG=1 timeout -k 60 4000 python tools/tpu_refprotocol.py \
    --phase n > /tmp/r5e_ladybug_n.log 2>&1
log "ladybug_n rc=$?"
sleep 10

log "fille u.json protocol (uniform 1024 spp, depth 128)"
timeout -k 60 6000 python tools/tpu_refprotocol.py --phase u --scene fille \
    > /tmp/r5e_fille_u.log 2>&1
log "fille_u rc=$?"
sleep 10

log "fille n.json protocol (guided 1024/256, depth 128)"
timeout -k 60 6000 python tools/tpu_refprotocol.py --phase n --scene fille \
    > /tmp/r5e_fille_n.log 2>&1
log "fille_n rc=$?"
sleep 10

log "good-seed same-run parity (det mode, seed 3)"
ELAINA_DETERMINISTIC=1 ELAINA_SEED=3 timeout -k 60 3000 \
    python tools/tpu_parity.py --scene spot --equal-time \
    --out /root/repo/BENCH_parity_seed3.json > /tmp/r5e_parity_s3.log 2>&1
log "parity_s3 rc=$?"
sleep 10

log "fille GT (uniform 2048 spp; deviation from 65,536 documented)"
timeout -k 60 9000 python tools/tpu_refprotocol.py --phase gt --scene fille \
    --gt-spp 2048 > /tmp/r5e_fille_gt.log 2>&1
log "fille_gt rc=$?"
sleep 10

log "fille rescore (RMSE vs the finished GT)"
timeout -k 60 900 python tools/tpu_refprotocol.py --phase rescore \
    --scene fille > /tmp/r5e_fille_rescore.log 2>&1
log "rescore rc=$?"
sleep 10

log "seed diagnostics (bad seed 0 vs good seed 1)"
timeout -k 60 3000 python tools/tpu_seed_diag.py --seeds 0,1 \
    > /tmp/r5e_seeddiag.log 2>&1
log "seeddiag rc=$?"
log "ALL DONE"
