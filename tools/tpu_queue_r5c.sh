#!/bin/bash
# Round-5 TPU queue, part 3: the two remaining flagship runs, serialized
# on the single-tenant chip.
#  1. tiers.pyfg full re-certification under the fail-closed certifier
#     (replaces the known-false rank-4 artifact; staircase checkpoints
#     to /tmp so a worker death resumes instead of restarting).
#  2. g2o100k end-to-end certify on the f64-tile finish path (e477e37).
#  3. Final headline bench.
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "parity tiers (tpu, fail-closed certifier, checkpointed)"
timeout 10000 $PY tools/parity.py --platform tpu --configs tiers
rc=$?
if [ $rc -ne 0 ]; then
  log "tiers attempt 1 exited rc=$rc; resuming from checkpoint"
  timeout 6000 $PY tools/parity.py --platform tpu --configs tiers
fi

log "g2o100k certify (tpu)"
timeout 7200 $PY tools/g2o100k_certify.py

log "bench.py headline"
timeout 1800 $PY bench.py

log "queue r5c done"
