#!/bin/bash
# Preset launcher mirroring the reference's eval.sh (eval.sh:1-61): same three
# model presets and hyperparameters, driving the TPU harness instead of the
# CUDA one. Usage: ./eval.sh [data_dir] [mode] [extra flags...]
#   mode: film_attn_pt (default) | film_gp_pt | time_multi_hop

set -euo pipefail

DATA_DIR="${1:-../data}"
MODE="${2:-film_attn_pt}"
shift $(( $# > 2 ? 2 : $# )) || true

num_classes=70
vocab_size=134
num_res_blocks=3
num_res_block_channels=1024
num_tail_channels=64
at_hidden_size=128
hidden_size=128
batch_size=32
loss_reduction="sum"
l_rate=0.0001
num_epochs=1
stats_after_every=500
frcnn_pretrained_path="${DATA_DIR}/vgg16_caffe.pth"

case ${MODE} in
time_multi_hop)
  batch_size=16
  l_rate=0.00005
  checkpoint_path="tmh_sum_5e-5_3b_1024f_64t.ckpt"
  log_file="tmh_sum_5e-5_3b_1024f_64t.log"
  ;;
film_gp_pt)
  num_res_blocks=4
  num_tail_channels=32
  checkpoint_path="gp_sum_1e-4_4b_1024f_32t.ckpt"
  log_file="gp_sum_1e-4_4b_1024f_32t.log"
  ;;
film_attn_pt)
  num_res_blocks=5
  checkpoint_path="at_sum_1e-4_4b_1024f_128ah_128h.ckpt"
  log_file="at_sum_1e-4_4b_1024f_128ah_128h.log"
  ;;
*)
  echo "unknown mode ${MODE}" >&2; exit 1
  ;;
esac

exec python -m videonavqa_tpu.cli.q_and_v_eval \
    --model "${MODE}" \
    --data_dir "${DATA_DIR}" \
    --num_classes ${num_classes} \
    --vocab_size ${vocab_size} \
    --num_res_blocks ${num_res_blocks} \
    --num_res_block_channels ${num_res_block_channels} \
    --num_tail_channels ${num_tail_channels} \
    --at_hidden_size ${at_hidden_size} \
    --hidden_size ${hidden_size} \
    --batch_size ${batch_size} \
    --loss_reduction ${loss_reduction} \
    --l_rate ${l_rate} \
    --num_epochs ${num_epochs} \
    --frcnn_pretrained_path "${frcnn_pretrained_path}" \
    --checkpoint_path "${checkpoint_path}" \
    --stats_after_every ${stats_after_every} \
    --metrics_file "${log_file%.log}.jsonl" \
    "$@" 2>&1 | tee -a "${log_file}"
