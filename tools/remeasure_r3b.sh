#!/bin/bash
# Round-3 TPU batch 2: after the tail/cost-cache/finepack-bucketing work.
# KEEP THE HOST CPU FREE while this runs (1 core; background jobs inflate
# the wall-clock rows — measured 2x on the uniform-256 parity row).
set -u
cd /root/repo

probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
(jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
EOF
}

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r3b.log; }

log "waiting for TPU"
until probe; do sleep 120; done
log "TPU up"

log "coldstart fille (1st: populates bucketed XLA cache)"
timeout 2400 python tools/coldstart.py --scene fille > /tmp/rm3b_cold1.log 2>&1
log "coldstart1 rc=$?"
log "coldstart fille (2nd: the user-facing fresh-scene number)"
timeout 1800 python tools/coldstart.py --scene fille > /tmp/rm3b_cold2.log 2>&1
log "coldstart2 rc=$?"
sleep 20

log "headline bench (tail opts)"
ELAINA_BALANCE_DEBUG=1 timeout 2400 python bench.py > /tmp/rm3b_bench.log 2>&1
log "bench rc=$?"
sleep 20

log "spot parity clean"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/rm3b_parity.log 2>&1
log "parity rc=$?"
sleep 20

log "3D RMSE parity (analytic)"
timeout 3600 python tools/tpu_parity3d.py > /tmp/rm3b_parity3d.log 2>&1
log "parity3d rc=$?"
sleep 20

log "neumann3d bench 256"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py --scene neumann3d --res 256 --spp 64 \
    --train-spp 16 > /tmp/rm3b_neumann.log 2>&1
log "neumann rc=$?"
log "bumpy3d bench 256 (Dirichlet-only comparator)"
timeout 3600 python bench.py --scene bumpy3d --res 256 --spp 64 \
    --train-spp 16 > /tmp/rm3b_bumpy256.log 2>&1
log "bumpy256 rc=$?"
sleep 20

log "reference-scale 1024^2"
timeout 2400 python tools/tpu_refscale.py > /tmp/rm3b_refscale.log 2>&1
log "refscale rc=$?"
log "ALL DONE"
