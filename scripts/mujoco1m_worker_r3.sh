#!/bin/bash
# Round-3 share of the Mujoco1M matrix (VERDICT r2 item 3): the four
# remaining tasks for ppo2+trpo x 3 seeds, plus 3 extra seeds on the two
# cells that trailed the reference mean in round 2.
# Usage: mujoco1m_worker_r3.sh <worker_idx> <num_workers>
set -u
W=$1; N=$2
cd /root/repo
TASKS=()
for env in Walker2d-v4 InvertedDoublePendulum-v4 Swimmer-v4 Reacher-v4; do
  for seed in 0 1 2; do
    TASKS+=("ppo2 $env $seed")
    TASKS+=("trpo_mpi $env $seed")
  done
done
for seed in 3 4 5; do
  TASKS+=("ppo2 Hopper-v4 $seed")
  TASKS+=("trpo_mpi InvertedPendulum-v4 $seed")
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
