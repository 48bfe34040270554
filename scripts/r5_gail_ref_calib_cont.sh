#!/bin/bash
# Continue the reference-calibration from-scratch GAIL seeds from their 3M
# checkpoints to the reference's 5M budget (gail/run_mujoco.py
# --num_timesteps default).  Params-only checkpoint: policy + obfilter
# restore, the discriminator re-initializes and re-converges within a few
# hundred iterations (same protocol as results/gail_weak scratch2-cont).
# Usage: r5_gail_ref_calib_cont.sh <seed>
set -u
seed=$1
cd /root/repo
export JAX_PLATFORMS=cpu
src=results/gail_ref_calib/gail-scratch-s$seed
out=results/gail_ref_calib/gail-scratch-s$seed-cont
mkdir -p "$out"
timeout 10000 python -m baselines_tpu.run \
  --alg=gail --env=HalfCheetah-v4 --seed=$((seed+100)) --num_timesteps=2e6 \
  --expert_path=results/gail_ref_calib/expert_ref_regime.npz \
  --load_path=$src/model.ckpt \
  --log_path=$out --save_path=$out/model.ckpt \
  > "$out/stdout.log" 2>&1 && touch "$out/DONE"
echo "[gailrc-cont] finished seed=$seed (exit=$?)"
