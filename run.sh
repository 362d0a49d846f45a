#!/usr/bin/env bash
# Train InstanceRefer-TPU with the default config (reference run.sh parity).
python scripts/train.py --config config/InstanceRefer.yaml --log_dir instancerefer_tpu "$@"
