#!/bin/bash
# Runs its share of the Mujoco1M benchmark matrix (VERDICT item 1).
# Usage: mujoco1m_worker.sh <worker_idx> <num_workers>
set -u
W=$1; N=$2
cd /root/repo
TASKS=()
for env in HalfCheetah-v4 Hopper-v4 InvertedPendulum-v4; do
  for seed in 0 1 2; do
    TASKS+=("ppo2 $env $seed")
    TASKS+=("trpo_mpi $env $seed")
  done
done
i=0
for t in "${TASKS[@]}"; do
  if [ $((i % N)) -eq "$W" ]; then
    set -- $t
    alg=$1; env=$2; seed=$3
    out="results/mujoco1m/${alg}-${env}-s${seed}"
    if [ -f "$out/DONE" ]; then i=$((i+1)); continue; fi
    mkdir -p "$out"
    echo "[worker $W] $alg $env seed=$seed -> $out"
    JAX_PLATFORMS=cpu timeout 5400 python -m baselines_tpu.run \
      --alg=$alg --env=$env --seed=$seed --num_timesteps=1e6 \
      --log_path=$out --save_path=$out/model.ckpt \
      > "$out/stdout.log" 2>&1 && touch "$out/DONE"
    echo "[worker $W] finished $alg $env seed=$seed (exit=$?)"
  fi
  i=$((i+1))
done
echo "[worker $W] all done"
