#!/usr/bin/env bash
# One-command real-data accuracy-parity runbook (VERDICT r4 #8).
#
# The day ScanRefer/ScanNet data and the published reference checkpoint are
# on a box, cashing the headline claim (Acc@0.25 = 37.6 / Acc@0.5 = 30.7,
# reference README.md:89-91) is:
#
#   scripts/parity_eval.sh <data_root> <reference.pth> [config] [out_root]
#
#   <data_root>       ScanRefer root: scannet/pointgroup_data/*.npy, glove.p,
#                     ScanRefer_filtered_val.json, scannet/meta_data/ (the
#                     layout scripts/prepare_data.py produces)
#   <reference.pth>   the published torch checkpoint (model_last.pth /
#                     model.pth / checkpoint.tar)
#   [config]          default config/InstanceRefer.yaml
#   [out_root]        default <data_root>/parity_outputs
#
# Steps: convert_checkpoint.py (torch -> orbax) -> eval.py (full val split,
# eval-time capacity-overflow gate ON: if the fixed caps truncate anything
# the run fails loud and tells you to re-fit with calibrate_bands --fit-caps)
# -> prints our Acc table next to the published numbers.
#
# Dry-run tested end-to-end on the fake dataset by
# tests/test_cli_e2e.py::test_parity_eval_runbook.
set -euo pipefail

if [ $# -lt 2 ]; then
  sed -n '2,20p' "$0" | sed 's/^# \{0,1\}//'
  exit 2
fi

DATA_ROOT=$1
PTH=$2
REPO=$(cd "$(dirname "$0")/.." && pwd)
CONFIG=${3:-$REPO/config/InstanceRefer.yaml}
OUT_ROOT=${4:-$DATA_ROOT/parity_outputs}
RUN="$OUT_ROOT/ScanRefer/parity/checkpoints/parity_run"

mkdir -p "$RUN"
# stale-cache guard: a previous parity run against a DIFFERENT checkpoint
# must not short-circuit this one
rm -f "$RUN/scores.npz"

echo "== converting $PTH -> $RUN/model_last"
python "$REPO/scripts/convert_checkpoint.py" "$PTH" "$RUN/model_last"

echo "== evaluating val split"
python "$REPO/scripts/eval.py" \
  --config "$CONFIG" --log_dir "$RUN" \
  --data_root "$DATA_ROOT" --output_root "$OUT_ROOT"

echo ""
echo "== reference published (README.md:89-91): acc@0.25=0.376  acc@0.5=0.307"
echo "== compare with the 'overall:' line above"
