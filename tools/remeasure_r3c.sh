#!/bin/bash
# Round-3 TPU batch 3: instrumented headline (find the 72 s of wall
# outside the phases in rm3b_bench) + equal-time re-run with the 12%
# budgeted train share.  Keep the host CPU free while this runs.
set -u
cd /root/repo

log() { echo "=== $1 $(date +%H:%M:%S)" | tee -a /tmp/remeasure_r3c.log; }

probe() {
  timeout 90 python - <<'PYEOF' >/dev/null 2>&1
import jax
jax.config.update("jax_platforms", "axon")
import jax.numpy as jnp
(jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
PYEOF
}

log "waiting for TPU"
until probe; do sleep 120; done
log "TPU up"

log "headline bench (instrumented)"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 2400 python bench.py \
    > /tmp/rm3c_bench.log 2>&1
log "bench rc=$?"
sleep 20

log "spot parity (12% train share)"
timeout 3000 python tools/tpu_parity.py --scene spot --equal-time \
    --out BENCH_parity.json > /tmp/rm3c_parity.log 2>&1
log "parity rc=$?"
sleep 20

log "3D RMSE parity (fixed bounds + RBL3)"
timeout 3600 python tools/tpu_parity3d.py > /tmp/rm3c_parity3d.log 2>&1
log "parity3d rc=$?"
sleep 20

log "neumann3d bench 256"
ELAINA_PHASE_DEBUG=1 ELAINA_BALANCE_DEBUG=1 timeout 3600 python bench.py \
    --scene neumann3d --res 256 --spp 64 --train-spp 16 \
    > /tmp/rm3c_neumann.log 2>&1
log "neumann rc=$?"
log "bumpy3d bench 256 (Dirichlet-only comparator)"
timeout 3600 python bench.py --scene bumpy3d --res 256 --spp 64 \
    --train-spp 16 > /tmp/rm3c_bumpy256.log 2>&1
log "bumpy256 rc=$?"
sleep 20

log "reference-scale 1024^2"
timeout 3000 python tools/tpu_refscale.py > /tmp/rm3c_refscale.log 2>&1
log "refscale rc=$?"
log "ALL DONE"
