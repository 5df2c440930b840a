#!/bin/bash
# Stage 3: train the EDM (reference scripts/train_edm.sh parity)
python -m auto_dynamic_deeplab_tpu.cli.train_edm \
  --dataset cityscapes_edm --C 2 --epochs 20 --lr 1e-3 "$@"
