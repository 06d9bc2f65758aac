"""Multi-host (pod-slice) initialisation helpers.

A multi-host scan is the same program as a single-host one: every host
builds runs for its own shard of regions, the mesh spans all hosts'
devices, and the per-motif histograms — the only cross-host data — are
``psum``-reduced over ICI/DCN by the scan step itself
(``parallel/pipeline.py``).  Exact global BH q-values then fall out of the
merged histogram on every host identically; host 0 writes the report.

Region sharding is deterministic (round-robin over the sorted region list)
so no coordination beyond ``jax.distributed.initialize`` is needed.
"""

from typing import List, Optional, Sequence, Tuple


def initialize_cluster(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise ``jax.distributed`` (no-op on a single host).

    In managed environments (GKE/TPU VMs) argument-less initialisation
    discovers the topology; otherwise pass coordinator/process info
    explicitly.
    """
    import jax

    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def shard_regions(
    regions: Sequence[Tuple[str, int, int]],
    process_id: int,
    num_processes: int,
) -> List[Tuple[str, int, int]]:
    """Deterministic round-robin region shard for this host."""
    ordered = sorted(regions)
    return [r for i, r in enumerate(ordered) if i % num_processes == process_id]


def is_report_host() -> bool:
    import jax

    return jax.process_index() == 0
