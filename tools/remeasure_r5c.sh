#!/bin/bash
# Round-5 TPU batch C: clean same-run spot parity table (the r5b run hit
# a one-off ~8s device stall inside the 256-budget guided_equal_time row
# — see tools/tpu_eqtime_guided_repro.py, which times the same path at
# 0.05s prefix and an on-budget 10.38s solve), then the LONG ladybug
# reference-protocol ground truth (1024^2, uniform) and the u/n runs.
set -u
cd /root/repo
log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/r5c.log; }

log "spot parity, full equal-time table (clean re-run)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    > /tmp/r5c_parity.log 2>&1
log "parity rc=$?"
sleep 5

log "ladybug reference-protocol GT (1024^2 uniform 8192 spp)"
timeout 12000 python tools/tpu_refprotocol.py --phase gt --gt-spp 8192 \
    > /tmp/r5c_gt.log 2>&1
log "gt rc=$?"
sleep 5

log "ladybug u.json protocol (uniform 1024 spp)"
timeout 3000 python tools/tpu_refprotocol.py --phase u \
    > /tmp/r5c_u.log 2>&1
log "u rc=$?"
sleep 5

log "ladybug n.json protocol (guided 1024/256)"
timeout 3600 python tools/tpu_refprotocol.py --phase n \
    > /tmp/r5c_n.log 2>&1
log "n rc=$?"
log "ALL DONE"
