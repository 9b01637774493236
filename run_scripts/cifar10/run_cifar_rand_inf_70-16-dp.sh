#!/usr/bin/env bash
# TPU rebuild of the reference experiment launcher (same hyperparameters;
# ref run_scripts/cifar10/run_cifar_rand_inf_70-16-dp.sh). Usage: bash run_cifar_rand_inf_70-16-dp.sh [seed_id] [data_id]
cd "$(dirname "$0")/../.."

SEED=${1:-0}
DATA_SEED=${2:-0}

python -m diffpure_tpu.cli \
  --exp ./exp_results \
  --seed $SEED \
  --data_seed $DATA_SEED \
  --config cifar10.yml \
  --domain cifar10 \
  --diffusion_type sde \
  --score_type score_sde \
  --adv_batch_size 64 \
  --num_sub 64 \
  --t 100 \
  --adv_eps 0.031373 \
  --classifier_name cifar10-wrn-70-16-dropout \
  --attack_version rand \
  --eot_iter 20
