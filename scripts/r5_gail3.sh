#!/bin/bash
# Continue the from-scratch GAIL seeds from their 3M checkpoints to the
# reference's 5M-step budget (run_mujoco.py --num_timesteps default).
# The params payload restores policy + obfilter; the discriminator
# re-initializes at the resume (params-only checkpoint) and re-converges
# within a few hundred iterations.
set -u
W=$1; N=$2
cd /root/repo
export JAX_PLATFORMS=cpu
for seed in 0 1 2; do
  if [ $((seed % N)) -ne "$W" ]; then continue; fi
  src=results/gail_weak/gail-scratch2-s$seed
  out=results/gail_weak/gail-scratch2-s$seed-cont
  if [ -f "$out/DONE" ]; then continue; fi
  mkdir -p "$out"
  echo "[gailc $W] seed=$seed -> $out"
  timeout 9000 python -m baselines_tpu.run \
    --alg=gail --env=HalfCheetah-v4 --seed=$((seed+100)) --num_timesteps=2e6 \
    --expert_path=results/gail_weak/expert_weak.npz \
    --load_path=$src/model.ckpt \
    --log_path=$out --save_path=$out/model.ckpt \
    > "$out/stdout.log" 2>&1 && touch "$out/DONE"
  echo "[gailc $W] finished seed=$seed (exit=$?)"
done
echo "[gailc $W] done"
