#!/bin/bash
# Round-5 serial TPU work queue.  The chip is single-tenant: every stage
# runs alone; failures do not stop the queue.
cd /root/repo
PY=/opt/venv/bin/python
log() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

log "spmm_bench city10000 rank 5 (r_pad=8: paired vs bucketed)"
timeout 1800 $PY tools/spmm_bench.py /root/reference/data/city10000.g2o 5

log "spmm_bench city10000 rank 9 (r_pad=16 sanity)"
timeout 1800 $PY tools/spmm_bench.py /root/reference/data/city10000.g2o 9

log "bench.py headline"
timeout 1800 $PY bench.py

log "parity kitti_07 (tpu, 600-outer budget)"
timeout 3600 $PY tools/parity.py --platform tpu --configs kitti_07

log "parity city10000 ra_slam_test_3d (tpu re-records under LDL witness)"
timeout 6000 $PY tools/parity.py --platform tpu --configs city10000 ra_slam_test_3d

log "parity single_drone (tpu re-record)"
timeout 4000 $PY tools/parity.py --platform tpu --configs single_drone

log "scaling city10000 tiled agents sweep"
timeout 5400 $PY tools/scaling_bench.py --dataset city10000 --agents 1 2 4 8 16 \
    --rounds 20 --backend tiled

log "queue done"
