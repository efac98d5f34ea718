#!/bin/bash
# Export predicted odometry h5s for train+val. Reference: scripts/odom/export_odom.sh
set -e
WORKING_DIR=${1:-runs/odom}
python -m panoptic_forecasting_tpu.cli.export_odom \
    --working_dir "$WORKING_DIR" \
    --config_file configs/odom/odom_train.yaml \
    --set data.data_splits "[train,val]" "${@:2}"
