"""Multi-host bootstrap (parity: the reference's torchrun multi-node launch,
13.interactive_segmentation_training/sa_1b_multi_node/*/train.sh and the
*_multi_node.py drivers computing total_rank — SURVEY.md §2.4).

SPMD makes multi-node a mesh concern, not a driver concern: call
``initialize_multihost()`` once at startup (env-driven, mirrors
jax.distributed), and the same Trainer/mesh code runs with DCN as the outer
mesh dim. Data loaders already shard by jax.process_index()."""

from __future__ import annotations

import os

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """No-op for single-process; otherwise wires jax.distributed from args or
    the standard env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, also honoring the reference-style MASTER_ADDR/RANK)."""
    coordinator_address = coordinator_address or \
        os.environ.get("JAX_COORDINATOR_ADDRESS") or \
        (f"{os.environ['MASTER_ADDR']}:{os.environ.get('MASTER_PORT', '1234')}"
         if "MASTER_ADDR" in os.environ else None)
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES",
                       os.environ.get("WORLD_SIZE", "1")))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", "0")))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0
