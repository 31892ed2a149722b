#!/bin/bash
# Unattended TPU measurement battery: waits for the tunnel to revive,
# then (re)runs every TPU-dependent benchmark and stores artifacts in
# /tmp/battery/.  Designed to run inside tmux and survive the session.
set -u
cd /root/repo
mkdir -p /tmp/battery
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

echo "[battery] waiting for TPU ... $(date)"
until timeout 150 python -c "import jax; d=jax.devices(); assert d[0].platform not in ('cpu',), d" >/dev/null 2>&1; do
  sleep 120
  echo "[battery] still waiting $(date)"
done
echo "[battery] TPU up at $(date)"

run() {
  name=$1; shift
  echo "[battery] START $name $(date)"
  "$@" > /tmp/battery/$name.out 2> /tmp/battery/$name.err
  echo "[battery] DONE $name rc=$? $(date)"
}

# 1) flagship 1M bench (warms the packet/stream kernel caches too)
run bench_1m python bench.py
# 2) Laplace 1M on TPU: DIA stencil (banded demo graph) ...
run laplace_dia env LAPLACE_TPU=1 python scripts/laplace_scale_demo.py
# ... and the gather-packet/stream CG (DIA disabled)
run laplace_gather env LAPLACE_TPU=1 XUGRID_TPU_CG_DIA=0 python scripts/laplace_scale_demo.py
# 3) 10M north-star config (stale artifact refresh)
run bench_xl env BENCH_XL=1 python bench.py
echo "[battery] ALL DONE $(date)"
