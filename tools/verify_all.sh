#!/usr/bin/env bash
# Full verification sweep — the five lanes from README "Verification".
# ~20 min total on local[32]. Each lane fails fast; run before a
# round's final commit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1/5 default pytest suite (incl. fuzz + fault tolerance) ==="
python -m pytest tests/ -q

echo "=== 2/5 oracle parity, ANSI mode ON ==="
python -m pytest tests/test_oracle_parity.py -m ansi -q

echo "=== 3/5 cross-scale parity at sf0.001 ==="
SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.001 \
  python -m pytest tests/test_oracle_parity.py -q

echo "=== 4/5 driver-gate simulator (vanilla session, all entries) ==="
python tools/driver_sim.py

echo "=== 5/5 bench smoke at sf0.01 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py

echo "ALL LANES GREEN"
