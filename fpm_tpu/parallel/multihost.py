"""Multi-host execution (SURVEY.md N3: DCN across hosts, ICI within a slice).

The reference is strictly single-process (SURVEY.md §2 parallelism
disclosure). Here multi-host runs use the standard JAX recipe:
``jax.distributed.initialize`` once per process, then build one global
('led', 'tile') mesh over ``jax.devices()`` — the same shard_map sweeps from
:mod:`fpm_tpu.parallel` run unchanged, with XLA routing ``psum``/``ppermute``
over ICI inside a slice and DCN between hosts. The mesh is laid out
host-major on the ``led`` axis so the per-sweep halo exchanges (tile axis)
stay intra-host/intra-slice and only the once-per-sweep all-reduces cross
DCN.

Tested without a cluster via the subprocess harness in
``tests/test_multihost.py`` (SURVEY.md §4.4).
"""

from __future__ import annotations

import os


def initialize_from_env(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    require: bool = False,
) -> bool:
    """Initialize jax.distributed from args or environment.

    Environment: ``FPM_COORDINATOR`` (host:port), ``FPM_NUM_PROCESSES``,
    ``FPM_PROCESS_ID`` — or, with ``require=True`` (the CLI's
    ``--distributed`` flag), JAX's native auto-detection (TPU pod metadata,
    SLURM, ...). Returns True when running distributed, False for
    single-process. A run that ASKED for distributed execution but cannot
    initialize it raises instead of silently running single-process (each
    host would otherwise solve an independent duplicate run).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("FPM_COORDINATOR")
    if num_processes is None and "FPM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["FPM_NUM_PROCESSES"])
    if process_id is None and "FPM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["FPM_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        if process_id is not None:
            raise ValueError(
                "FPM_PROCESS_ID is set but FPM_COORDINATOR/FPM_NUM_PROCESSES "
                "are not — partial multi-host configuration"
            )
        if not require:
            return False
        try:
            jax.distributed.initialize()  # JAX-native auto-detection
        except Exception as e:
            raise ValueError(
                "--distributed requested but no multi-host configuration "
                "found: set FPM_COORDINATOR/FPM_NUM_PROCESSES/FPM_PROCESS_ID "
                f"or run under a supported launcher (auto-detect said: {e})"
            ) from e
        return True

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(tile: int = 1):
    """Build the global ('led', 'tile') mesh over all processes' devices.

    Tile neighbors must exchange halos every sweep; devices are assigned so
    consecutive tile coordinates land on the same host where possible.
    """
    import jax

    from .mesh import make_mesh

    n = len(jax.devices())
    if n % tile != 0:
        raise ValueError(f"{n} global devices not divisible by tile={tile}")
    return make_mesh(led=n // tile, tile=tile)


def is_coordinator() -> bool:
    import jax

    return jax.process_index() == 0
