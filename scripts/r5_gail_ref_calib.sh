#!/bin/bash
# From-scratch GAIL at the reference's own calibration (VERDICT r4 item 5,
# completed at the true expert level): the expert is an intermediate ppo2
# checkpoint picked from one run's periodic checkpoints to land in the
# reference's ~895-score regime (gail/result/gail-result.md +
# HalfCheetah-unnormalized-deterministic-scores.png: expert ~895, best
# gail-imitator ~780 = 0.87x at 50 trajectories).  Ours: deterministic
# 984.0 +/- 16.4 over the 52-trajectory dump.  Bar: >=0.8x expert = 787.
# Usage: r5_gail_ref_calib.sh <worker_idx> <num_workers>
set -u
W=$1; N=$2
cd /root/repo
export JAX_PLATFORMS=cpu
for seed in 0 1 2; do
  if [ $((seed % N)) -ne "$W" ]; then continue; fi
  out=results/gail_ref_calib/gail-scratch-s$seed
  if [ -f "$out/DONE" ]; then continue; fi
  mkdir -p "$out"
  echo "[gailrc $W] seed=$seed -> $out"
  timeout 10000 python -m baselines_tpu.run \
    --alg=gail --env=HalfCheetah-v4 --seed=$seed --num_timesteps=3e6 \
    --expert_path=results/gail_ref_calib/expert_ref_regime.npz \
    --log_path=$out --save_path=$out/model.ckpt \
    > "$out/stdout.log" 2>&1 && touch "$out/DONE"
  echo "[gailrc $W] finished seed=$seed (exit=$?)"
done
echo "[gailrc $W] done"
