"""Multi-host process bootstrap: jax.distributed.initialize wiring.

The reference is single-process (SURVEY.md §2.9); the TPU-native
equivalent is SPMD over hosts — every host runs the same CLI, JAX is
initialized with a coordinator, and the training pipeline keeps a global
shuffle order while each host materializes its contiguous block of every
global batch (data/pipeline.py, mesh.global_batch). Configuration is
environment-driven so the CLI flag surface stays reference-shaped:

  COMIC_COORDINATOR   coordinator address host:port (presence enables
                      multi-host init)
  COMIC_NUM_PROCESSES total process count (optional on TPU pods, where
                      JAX can auto-detect)
  COMIC_PROCESS_ID    this process's index (optional on TPU pods)

On Cloud TPU pods, `jax.distributed.initialize()` with no arguments also
auto-detects everything; setting COMIC_COORDINATOR=auto requests that.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed(coordinator: Optional[str] = None,
                                 num_processes: Optional[int] = None,
                                 process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when configured; returns True if it ran.

    No-ops (returns False) when no coordinator is configured, so
    single-host runs never touch the distributed runtime.
    """
    coordinator = coordinator or os.environ.get("COMIC_COORDINATOR")
    if not coordinator:
        return False
    import jax

    if coordinator == "auto":
        jax.distributed.initialize()
        return True
    if num_processes is None:
        env = os.environ.get("COMIC_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("COMIC_PROCESS_ID")
        process_id = int(env) if env else None
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
