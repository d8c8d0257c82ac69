#!/bin/bash
# Post-TPU-outage measurement pipeline: waits for the tunnel, then runs the
# queued profiles + bench serially (single TPU owner). Output: /tmp/post_outage.log
cd /root/repo
LOG=/tmp/post_outage.log
echo "=== post_outage $(date -u) ===" >> $LOG
while true; do
  if timeout 90 python -c "
import jax, numpy as np
print(np.asarray(jax.jit(lambda a: (a@a).sum())(jax.numpy.ones((128,128)))))" >> $LOG 2>&1; then
    echo "TPU BACK $(date -u)" >> $LOG
    break
  fi
  echo "tpu still down $(date -u)" >> $LOG
  sleep 240
done
set -x
{
  echo "--- profile_r50_breakdown ---"
  timeout 3600 python scripts/profile_r50_breakdown.py
  echo "--- profile_r50 (uoais_resnet50) ---"
  timeout 2400 python scripts/profile_r50.py uoais_resnet50
  echo "--- profile_r50 (uoais_resnet50 fast bf16-pd) ---"
  timeout 2400 python scripts/profile_r50.py uoais_resnet50 fast
  echo "--- profile_r50 (tabletop_swin) ---"
  timeout 2400 python scripts/profile_r50.py tabletop_swin
  echo "--- bench ---"
  timeout 2400 python bench.py
  echo "--- key_stride decisive ---"
  timeout 3600 python scripts/profile_key_stride.py
  echo "=== post_outage done $(date -u) ==="
} >> $LOG 2>&1
