#!/bin/bash
# two-host launch (parity: reference sa_1b_multi_node train.sh torchrun lines;
# JAX multi-host replaces torchrun: run this script once per host)
# host 0:
#   JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=0 \
#     python tools/train_interactive_segmentation_distill.py --work-dir ./
# host 1:
#   JAX_COORDINATOR_ADDRESS=host0:8476 JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=1 \
#     python tools/train_interactive_segmentation_distill.py --work-dir ./
python ../../../../tools/train_interactive_segmentation_distill.py --work-dir ./
