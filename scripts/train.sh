#!/bin/bash
# Stage 2: train the decoded ADD network (reference scripts/train_dist.sh parity;
# data parallelism is automatic over the attached TPU mesh — no launcher needed)
python -m auto_dynamic_deeplab_tpu.cli.train \
  --dataset cityscapes --network ADD --C 2 \
  --batch-size 16 --epochs 2689 --lr 0.05 --lr-scheduler poly \
  --use-balanced-weights --sync-bn --bf16 "$@"
