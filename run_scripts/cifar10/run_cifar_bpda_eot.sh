#!/usr/bin/env bash
# TPU rebuild of the reference experiment launcher (same hyperparameters;
# ref run_scripts/cifar10/run_cifar_bpda_eot.sh). Usage: bash run_cifar_bpda_eot.sh [seed_id] [data_id]
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
  --adv_batch_size 10 \
  --num_sub 200 \
  --t 100 \
  --adv_eps 0.031373 \
  --classifier_name cifar10-wideresnet-28-10 \
  --attack_version bpda \
  --eot_defense_reps 150 \
  --eot_attack_reps 15
