#!/bin/bash
# Round-5 from-scratch GAIL, second campaign: with the reference policy
# obfilter (mlp_policy.py:34-42) + run_mujoco CLI hyperparams
# (hid 100x2, vf_iters=5, vf_stepsize=1e-3), 3e6 steps (the reference
# trains 5e6; curves separate well before 3e6).
set -u
W=$1; N=$2
cd /root/repo
export JAX_PLATFORMS=cpu
for seed in 0 1 2; do
  if [ $((seed % N)) -ne "$W" ]; then continue; fi
  out=results/gail_weak/gail-scratch2-s$seed
  if [ -f "$out/DONE" ]; then continue; fi
  mkdir -p "$out"
  echo "[gailw $W] seed=$seed -> $out"
  timeout 12000 python -m baselines_tpu.run \
    --alg=gail --env=HalfCheetah-v4 --seed=$seed --num_timesteps=3e6 \
    --expert_path=results/gail_weak/expert_weak.npz \
    --log_path=$out --save_path=$out/model.ckpt \
    > "$out/stdout.log" 2>&1 && touch "$out/DONE"
  echo "[gailw $W] finished seed=$seed (exit=$?)"
done
echo "[gailw $W] done"
