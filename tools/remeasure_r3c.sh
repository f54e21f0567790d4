#!/bin/bash
# Round-3 TPU batch 3: instrumented headline (find the 72 s of wall
# outside the phases in rm3b_bench) + equal-time re-run with the 12%
# budgeted train share.  Keep the host CPU free while this runs.
set -u
cd /root/repo

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r3c.log; }

log "headline bench (instrumented)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 2400 python bench.py \
    > /tmp/rm3c_bench.log 2>&1
log "bench rc=$?"
sleep 20

log "spot parity (12% train share)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/rm3c_parity.log 2>&1
log "parity rc=$?"
log "ALL DONE"
