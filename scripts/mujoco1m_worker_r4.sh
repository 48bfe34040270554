#!/bin/bash
# Round-4 share of the Mujoco1M matrix (VERDICT r3 item 3):
#  - seeds 3..5 for every cell still at 3 seeds (11 cells x 3 seeds), so all
#    14 cells reach the reference's 6-trial protocol
#    (/root/reference/baselines/bench/benchmarks.py:83-87)
#  - the controlled ppo2 InvertedDoublePendulum experiment: 3 single-knob
#    variants x 3 seeds isolating which ppo2 default drives the IDP deficit
#    (results go to results/mujoco1m_idp_exp/)
# Usage: mujoco1m_worker_r4.sh <worker_idx> <num_workers>
set -u
W=$1; N=$2
cd /root/repo
TASKS=()
# thinnest round-3 claim first: trpo Swimmer (62.6 vs reference 94.96)
for seed in 3 4 5; do TASKS+=("trpo_mpi Swimmer-v4 $seed results/mujoco1m"); done
for env in HalfCheetah-v4 Hopper-v4 InvertedDoublePendulum-v4 Reacher-v4 Walker2d-v4; do
  for seed in 3 4 5; do TASKS+=("trpo_mpi $env $seed results/mujoco1m"); done
done
for env in HalfCheetah-v4 InvertedPendulum-v4 Swimmer-v4 Reacher-v4 Walker2d-v4; do
  for seed in 3 4 5; do TASKS+=("ppo2 $env $seed results/mujoco1m"); done
done
# IDP experiment: one knob changed per variant, reference defaults otherwise
for seed in 0 1 2; do
  TASKS+=("ppo2 InvertedDoublePendulum-v4 $seed results/mujoco1m_idp_exp/constlr --lr=3e-4")
  TASKS+=("ppo2 InvertedDoublePendulum-v4 $seed results/mujoco1m_idp_exp/novclip --clip_value=False")
  TASKS+=("ppo2 InvertedDoublePendulum-v4 $seed results/mujoco1m_idp_exp/sharedvf --value_network=shared")
done
i=0
for t in "${TASKS[@]}"; do
  if [ $((i % N)) -eq "$W" ]; then
    set -- $t
    alg=$1; env=$2; seed=$3; base=$4; shift 4; extra=("$@")
    out="${base}/${alg}-${env}-s${seed}"
    if [ -f "$out/DONE" ]; then i=$((i+1)); continue; fi
    mkdir -p "$out"
    echo "[worker $W] $alg $env seed=$seed ${extra[*]:-} -> $out"
    JAX_PLATFORMS=cpu timeout 5400 python -m baselines_tpu.run \
      --alg=$alg --env=$env --seed=$seed --num_timesteps=1e6 \
      --log_path=$out --save_path=$out/model.ckpt "${extra[@]}" \
      > "$out/stdout.log" 2>&1 && touch "$out/DONE"
    echo "[worker $W] finished $alg $env seed=$seed (exit=$?)"
  fi
  i=$((i+1))
done
echo "[worker $W] all done"
