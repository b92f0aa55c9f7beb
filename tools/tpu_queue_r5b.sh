#!/bin/bash
# Round-5 TPU queue, part 2 (after the g2o100k restart): the stages that
# failed in part 1 — scaling sweep (dataset arg fixed) and the
# single_drone re-record (transient TPU backend error) — plus a final
# headline bench under the restored bucketed SpMM default.
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "scaling city10000 tiled agents sweep"
timeout 5400 $PY tools/scaling_bench.py --dataset city10000.g2o \
    --agents 1 2 4 8 16 --rounds 20 --backend tiled

log "parity single_drone (tpu re-record)"
timeout 4000 $PY tools/parity.py --platform tpu --configs single_drone

log "bench.py headline (bucketed default)"
timeout 1800 $PY bench.py

log "queue2 done"
