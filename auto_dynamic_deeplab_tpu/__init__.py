"""auto_dynamic_deeplab_tpu — a TPU-native (JAX/XLA/Pallas) framework with the
capabilities of HankKung/Auto-Dynamic-DeepLab (IROS 2021 "ADD").

Built from scratch, TPU-first:
  * NHWC layout, static shapes, explicit-padding convolutions (PyTorch-parity
    output sizes on the odd 769/1025/2049 spatial chain).
  * BatchNorm as a pure function with optional cross-replica `lax.pmean`
    statistics over a named mesh axis (replaces the reference's thread-based
    SyncBN, modeling/sync_batchnorm/).
  * Data parallelism via `jax.shard_map` over a `jax.sharding.Mesh`
    (replaces DataParallel / DDP+NCCL, train.py:48-53).
  * Early-exit dynamic inference as per-segment compiled programs so an early
    exit genuinely skips FLOPs (reference: modeling/ADD.py:379-488).

Package map (mirrors SURVEY.md §2 component inventory):
  ops/       primitive op library, ASPP, decoder head, BN, resize, confidence
  models/    ADD, EDM, baseline multi-exit, AutoDeepLab, NAS supernets
  nas/       genotype schema + Viterbi/genotype decoding (host-side NumPy)
  data/      Cityscapes/Pascal datasets, transforms, loader factory
  parallel/  mesh construction, sharding helpers, distributed train steps
  train/     losses, LR schedules, stage trainers (search/train/EDM), eval
  utils/     metrics (confusion-matrix mIoU), checkpointing, meters, FLOPs
  kernels/   Pallas TPU kernels for hot memory-bound ops
  cli/       drivers mirroring search.py / train.py / train_edm.py / eval.py
"""

__version__ = "0.1.0"
