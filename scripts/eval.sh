#!/bin/bash
# Stage 4: dynamic early-exit evaluation (reference scripts/eval.sh parity)
python -m auto_dynamic_deeplab_tpu.cli.evaluate \
  --dataset cityscapes --C 2 --dynamic --confidence edm --threshold 0.0 "$@"
