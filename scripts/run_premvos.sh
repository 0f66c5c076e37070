#!/bin/sh
# Orchestration mirror of the reference's run.sh (SURVEY.md C12/L5).
#
# The production path is the fused pipeline:
#     python -m premvos_tpu.pipeline.run_davis --davis_root "$DAVIS" \
#         --output "$OUT" [--finetune] [--resume]
#
# This script instead chains the reference-style *staged* mode — five
# separate stage commands passing JSON/.flo/PNG through $WORK — useful for
# stage-level debugging and golden-parity dumps.
set -e

DAVIS=${1:?usage: run_premvos.sh DAVIS_ROOT WORK_DIR [SEQ ...]}
WORK=${2:?usage: run_premvos.sh DAVIS_ROOT WORK_DIR [SEQ ...]}
shift 2

if [ $# -gt 0 ]; then
  SEQS="$@"
else
  SEQS=$(cat "$DAVIS/ImageSets/2017/val.txt")
fi

for SEQ in $SEQS; do
  echo "=== $SEQ ==="
  for STAGE in proposals refine flow reid merge; do
    python -m premvos_tpu.pipeline.run_stages "$STAGE" \
      --davis_root "$DAVIS" --seq "$SEQ" --work "$WORK"
  done
done
echo "results in $WORK/results"
