#!/bin/bash
# SCALE.md tier collector: runs scale_tier.py per REFINE level, one TPU
# process at a time.  SPMV shootout at refine=8 (nnz ~ 2e6, VERDICT task 5).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export PIP_TPU_CACHE_DIR=/tmp/pip_tpu_jax_cache
for R in "$@"; do
    SPMV=0
    [ "$R" = "8" ] && SPMV=1
    echo "==== tier REFINE=$R (SPMV=$SPMV) ===="
    REFINE=$R SPMV=$SPMV GN=1 timeout 4500 python -u .probes/scale_tier.py \
        2>&1 | grep --line-buffered -v -e WARN -e "^E08"
    echo "==== tier REFINE=$R exit=$? ===="
done
