#!/bin/bash
# Stage 1: NAS path search on Cityscapes (reference scripts/search_cityscapes.sh parity)
python -m auto_dynamic_deeplab_tpu.cli.search \
  --dataset cityscapes --network net_supernet \
  --batch-size 16 --epochs 300 --alpha-epoch 150 \
  --F 20 --B 5 --C 2 --lr 0.05 --min-lr 0.003 \
  --arch-lr 1e-3 --weight-decay 8e-4 --arch-weight-decay 1e-3 \
  --seed 2 "$@"
