#!/bin/bash
# Round-4 serial TPU work queue.  The chip is single-tenant: every stage
# runs alone, failures do not stop the queue.
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "bench.py"
timeout 1200 $PY bench.py

log "parity kitti_09 (tpu)"
timeout 3000 $PY tools/parity.py --platform tpu --configs kitti_09
log "parity kitti_00 (tpu)"
timeout 3000 $PY tools/parity.py --platform tpu --configs kitti_00
log "parity kitti_05 (tpu)"
timeout 3000 $PY tools/parity.py --platform tpu --configs kitti_05
log "parity kitti_02 kitti_08 ais2klinik (tpu)"
timeout 6000 $PY tools/parity.py --platform tpu --configs kitti_02 kitti_08 ais2klinik

log "parity ra_slam_test_3d single_drone (tpu)"
timeout 6000 $PY tools/parity.py --platform tpu --configs ra_slam_test_3d single_drone

log "scaling g2o100k tiled (tpu)"
timeout 3600 $PY tools/scaling_bench.py --dataset g2o100k --agents 1 8 \
    --rounds 20 --backend tiled

log "queue done"
