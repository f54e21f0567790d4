#!/bin/bash
# Round-5 TPU batch H: final flagship tables under the new
# grad-clip-0.5 default — same-run spot parity (expect ~0.70 equal-spp
# and both equal-time squeezes), the drain-to-completion headline
# (rate sanity: clip adds one global-norm reduction per optimizer
# pass), and the Neumann-scene quality rows.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5h.log; }

log "final same-run spot parity (new default)"
timeout -k 60 3000 python tools/tpu_parity.py --scene spot --equal-time \
    > /tmp/r5h_parity.log 2>&1
log "parity rc=$?"
sleep 5

log "final headline bench (full drain, new default)"
timeout -k 60 3000 python bench.py > /tmp/r5h_headline.log 2>&1
log "headline rc=$?"
sleep 5

log "neumann3d quality (new default)"
timeout -k 60 3000 python tools/tpu_neumann_quality.py --res 128 \
    --gt-spp 1024 --spp 64 --equal-time > /tmp/r5h_nquality.log 2>&1
log "nquality rc=$?"
log "H ALL DONE"
