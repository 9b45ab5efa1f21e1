#!/usr/bin/env bash
# Round-end checklist (r5 verdict item 8) — run from the repo root
# BEFORE the round closes, on an otherwise-idle machine:
#
#   bash scripts/round_end.sh            # full gate (~25 min)
#   bash scripts/round_end.sh --fast     # skip the sf0.1 bench
#
# 1. full local suite (unit + plan lint + sf0.001 oracle parity)
# 2. sf0.01 oracle-parity sweep — the DRIVER's scale factor; sf0.001
#    can pass while sf0.01 fails (more rows -> more float-boundary
#    hits; this sweep caught the MMR half-rounding flip in r4)
# 3. sf0.1 bench, idle machine (writes bench_full.json — commit it)
# 4. regenerate the COVERAGE.md ledger
#
# After it is green: commit bench_full.json + COVERAGE.md, update the
# round-state memory, and leave _CHECK_FIRST staged for the next round.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== [1/4] full local suite (incl. FULL sf0.001 parity sweep) =="
SPARK_GRAFT_FULL_PARITY=1 python -m pytest tests/ -x -q

echo "== [2/4] FULL sf0.01 oracle-parity sweep (driver SF) =="
SPARK_GRAFT_FULL_PARITY=1 SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 \
    python -m pytest tests/test_oracle_parity.py -q

if [[ "${1:-}" != "--fast" ]]; then
    echo "== [3/4] sf0.1 bench (idle machine!) =="
    python bench.py
else
    echo "== [3/4] bench SKIPPED (--fast) =="
fi

echo "== [4/4] coverage ledger =="
python scripts/derive_coverage.py

echo "round_end: ALL GREEN — commit bench_full.json + COVERAGE.md,"
echo "update the round-state memory, verify _CHECK_FIRST staging."
