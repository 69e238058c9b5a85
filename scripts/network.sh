#!/bin/bash
# DCN traffic capture (reference network.sh:1-9).  On TPU this sees only
# cross-host (DCN) bytes — the gradient all-reduce inside a slice rides ICI,
# which no NIC observes; that part is accounted analytically from compiled
# HLO (tethys_tpu/profiling/hlo_comm.py) into <job>_collectives.txt.

WORKSPACE=${TETHYS_WORKSPACE:-/workspace}
RESULT=${TETHYS_RESULT:-/result}

JOB=`python3 ${WORKSPACE}/job_name.py`;
IP=`ifconfig eth0 | grep 'inet ' | awk '{print $2}'`;

MODEL=`cat ${WORKSPACE}/model.txt`;

tcpdump host ${IP} -s 64 -w ${RESULT}/${MODEL}/${JOB}_${IP}_network.pcap &
