#!/usr/bin/env bash
# Empirical scale curves for the heavy operator families (SCALING.md
# "SCALE_CURVES"): runs graft.ScaleStress over 1x/3x/10x inflations of
# the sf0.1 corpus and tees the per-(op, scale) JSON lines to
# scale_curves.jsonl. Quiet machine required (same rules as the bench:
# loadavg < 2 before starting, nothing else on the box).
#
# Usage: scripts/scale_curves.sh [scales...]   # e.g. 1 3 10
set -euo pipefail
cd "$(dirname "$0")/.."
SCALES="${*:-1 3 10}"
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  sbt -batch "runMain graft.ScaleStress $SCALES" \
  | grep -E '^\{"op"' | tee scale_curves.jsonl
