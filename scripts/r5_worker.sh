#!/bin/bash
# Round-5 CPU experiment share (VERDICT r4 items 2, 5, 6):
#  - Swimmer seed-collapse probe (item 2): rerun the four collapsed cells
#    (ppo2 s3/s5, trpo s1/s2 -- finals 47/49/33/49) under reference-exposed
#    knobs: --gamma=0.9995 (horizon) and --ent_coef=0.01 (exploration,
#    ppo2 only), plus fresh default seeds 6/7 to estimate collapse frequency.
#  - IDP copy-config elimination table (item 6): value-side knobs the
#    reference CLI exposes, under value_network='copy' defaults:
#    vf_coef=1.0, nminibatches=64, lam=0.98 x 3 seeds each.
#  - From-scratch GAIL at the reference's own calibration (item 5):
#    worker 0 first trains a WEAK expert (early ppo2 HalfCheetah checkpoint,
#    ~895-score regime of gail/result/gail-result.md), dumps the npz, then
#    runs 3 non-pretrained GAIL seeds.
# Usage: r5_worker.sh <worker_idx> <num_workers>
set -u
W=$1; N=$2
cd /root/repo
export JAX_PLATFORMS=cpu

run_one() {  # alg env seed out extra...
  local alg=$1 env=$2 seed=$3 out=$4; shift 4
  if [ -f "$out/DONE" ]; then return 0; fi
  mkdir -p "$out"
  echo "[worker $W] $alg $env seed=$seed $* -> $out"
  timeout 5400 python -m baselines_tpu.run \
    --alg=$alg --env=$env --seed=$seed --num_timesteps=1e6 \
    --log_path=$out --save_path=$out/model.ckpt "$@" \
    > "$out/stdout.log" 2>&1 && touch "$out/DONE"
  echo "[worker $W] finished $alg $env seed=$seed (exit=$?)"
}

# ---- worker 0: from-scratch GAIL track (sequenced) --------------------
if [ "$W" -eq 0 ]; then
  GW=results/gail_weak
  mkdir -p $GW
  if [ ! -f $GW/expert_weak.npz ]; then
    # weak expert: early ppo2 checkpoint (2e5 steps ~= the reference's
    # ~895-score regime on HalfCheetah)
    if [ ! -f $GW/expert_train/DONE ]; then
      mkdir -p $GW/expert_train
      echo "[worker 0] training weak expert (ppo2 HalfCheetah 2e5)"
      timeout 3600 python -m baselines_tpu.run \
        --alg=ppo2 --env=HalfCheetah-v4 --seed=0 --num_timesteps=2e5 \
        --log_path=$GW/expert_train --save_path=$GW/expert_train/model.ckpt \
        > $GW/expert_train/stdout.log 2>&1 && touch $GW/expert_train/DONE
    fi
    python scripts/gail_expert_dump.py \
      --ckpt $GW/expert_train/model.ckpt --out $GW/expert_weak.npz \
      > $GW/expert_dump.log 2>&1
    cat $GW/expert_dump.log
  fi
  if [ -f $GW/expert_weak.npz ]; then
    for seed in 0 1 2; do
      out=$GW/gail-scratch-s$seed
      if [ -f "$out/DONE" ]; then continue; fi
      mkdir -p "$out"
      echo "[worker 0] gail from-scratch seed=$seed -> $out"
      timeout 5400 python -m baselines_tpu.run \
        --alg=gail --env=HalfCheetah-v4 --seed=$seed --num_timesteps=1.5e6 \
        --expert_path=$GW/expert_weak.npz \
        --log_path=$out --save_path=$out/model.ckpt \
        > "$out/stdout.log" 2>&1 && touch "$out/DONE"
      echo "[worker 0] finished gail seed=$seed (exit=$?)"
    done
  else
    echo "[worker 0] WEAK EXPERT DUMP FAILED - skipping gail track"
  fi
fi

# ---- shared queue (striped i % N), decisive experiments first ---------
TASKS=(
  "ppo2 Swimmer-v4 3 results/swimmer_exp/gamma9995 --gamma=0.9995"
  "ppo2 Swimmer-v4 5 results/swimmer_exp/gamma9995 --gamma=0.9995"
  "trpo_mpi Swimmer-v4 1 results/swimmer_exp/gamma9995 --gamma=0.9995"
  "trpo_mpi Swimmer-v4 2 results/swimmer_exp/gamma9995 --gamma=0.9995"
  "ppo2 InvertedDoublePendulum-v4 0 results/mujoco1m_idp_exp/vfcoef1 --vf_coef=1.0"
  "ppo2 InvertedDoublePendulum-v4 1 results/mujoco1m_idp_exp/vfcoef1 --vf_coef=1.0"
  "ppo2 Swimmer-v4 3 results/swimmer_exp/ent01 --ent_coef=0.01"
  "ppo2 Swimmer-v4 5 results/swimmer_exp/ent01 --ent_coef=0.01"
  "ppo2 InvertedDoublePendulum-v4 2 results/mujoco1m_idp_exp/vfcoef1 --vf_coef=1.0"
  "ppo2 InvertedDoublePendulum-v4 0 results/mujoco1m_idp_exp/nmb64 --nminibatches=64"
  "ppo2 InvertedDoublePendulum-v4 1 results/mujoco1m_idp_exp/nmb64 --nminibatches=64"
  "ppo2 InvertedDoublePendulum-v4 2 results/mujoco1m_idp_exp/nmb64 --nminibatches=64"
  "ppo2 Swimmer-v4 6 results/swimmer_exp/default"
  "ppo2 Swimmer-v4 7 results/swimmer_exp/default"
  "ppo2 InvertedDoublePendulum-v4 0 results/mujoco1m_idp_exp/lam98 --lam=0.98"
  "ppo2 InvertedDoublePendulum-v4 1 results/mujoco1m_idp_exp/lam98 --lam=0.98"
  "ppo2 InvertedDoublePendulum-v4 2 results/mujoco1m_idp_exp/lam98 --lam=0.98"
  "trpo_mpi Swimmer-v4 6 results/swimmer_exp/default"
)
i=0
for t in "${TASKS[@]}"; do
  if [ $((i % N)) -eq "$W" ]; then
    set -- $t
    alg=$1; env=$2; seed=$3; base=$4; shift 4
    run_one "$alg" "$env" "$seed" "${base}/${alg}-${env}-s${seed}" "$@"
  fi
  i=$((i+1))
done
echo "[worker $W] all done"
