#!/bin/bash
# Round-4 TPU queue 2: g2o100k certification wall-clock, feasible-size
# scaling sweep, kitti TPU-platform row under the BTD policy.
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "g2o100k certify (tpu)"
timeout 9000 $PY tools/g2o100k_certify.py --rmax 8 --tcg 50

log "scaling g2o100k tiled agents 1 2 4 (tpu)"
timeout 3600 $PY tools/scaling_bench.py --dataset g2o100k --agents 1 2 4 \
    --rounds 10 --backend tiled

log "parity kitti_05 (tpu, btd)"
timeout 1800 $PY tools/parity.py --platform tpu --configs kitti_05

log "queue2 done"
