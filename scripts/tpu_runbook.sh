#!/usr/bin/env bash
# Relay-return runbook: run the queued TPU measurements in priority order.
# Each step is independently timeoutted so a mid-run relay outage doesn't
# wedge the queue; results land in /tmp/tpu_runbook/.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_runbook
mkdir -p "$OUT"

probe() {
  timeout 90 python - <<'EOF'
import jax
d = jax.devices()
x = jax.numpy.ones((512, 512), jax.numpy.bfloat16)
(x @ x).block_until_ready()
print("TPU up:", d[0])
EOF
}

echo "== probe =="
probe || { echo "relay down; aborting"; exit 1; }

echo "== 1. on-TPU compiled kernel parity (stems + flat DAG) =="
ADD_TPU_TESTS=1 timeout 2400 python -m pytest tests -k on_tpu -q -p no:cacheprovider \
  2>&1 | tee "$OUT/on_tpu_tests.txt" | tail -5

echo "== 2. A/B cell execution paths (xla/packed/flat) =="
timeout 3600 python scripts/ab_flat_cell.py 2>&1 | tee "$OUT/ab_flat_cell.txt" | tail -40

echo "== 3. stems TS1 sweep =="
timeout 2400 python scripts/ab_stems_ts1.py 2>&1 | tee "$OUT/ab_stems_ts1.txt" | tail -10

echo "== 4. scale proof (search supernet 321^2 + train 769^2 bs16) =="
timeout 5400 python scripts/scale_proof.py --out SCALE_r02.json 2>&1 \
  | tee "$OUT/scale_proof.txt" | tail -40

echo "== 5. full bench =="
timeout 5400 python bench.py 2>&1 | tee "$OUT/bench.txt" | tail -3

echo "== runbook done; results in $OUT =="
