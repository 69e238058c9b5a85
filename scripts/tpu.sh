#!/bin/bash
# TPU chip-monitor capture (gpu.sh equivalent, reference gpu.sh:1-8).
# Launches the native monitor daemon; output goes to the per-job result file.

WORKSPACE=${TETHYS_WORKSPACE:-/workspace}
RESULT=${TETHYS_RESULT:-/result}

JOB=`python3 ${WORKSPACE}/job_name.py`;

MODEL=`cat ${WORKSPACE}/model.txt`;

${WORKSPACE}/monitor/tpu_monitor > ${RESULT}/${MODEL}/${JOB}_gpu.txt &
