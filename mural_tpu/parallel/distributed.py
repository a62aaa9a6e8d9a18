"""Multi-host initialisation.

The reference's distributed substrate was Ray actor RPC (SURVEY.md 2.3);
the TPU-native equivalent is JAX's own runtime: on a multi-host TPU pod
slice each host calls :func:`initialize` once, after which
``jax.devices()`` spans the whole slice and the existing mesh-based code
(trial packing, data-parallel training, sharded prediction) works
unchanged -- collectives ride ICI, host coordination rides DCN.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wrapper over ``jax.distributed.initialize``.

    On Cloud TPU the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere.  Safe to call when already
    initialised or in single-process mode (no-op).
    """
    import jax

    # NOTE: jax.process_count() would itself initialise the XLA backend,
    # after which jax.distributed.initialize refuses to run -- only the
    # explicit is_initialized() probe is safe here.
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError):
        # single-process environments raise; that's fine
        if num_processes not in (None, 1):
            raise
        return


def is_primary() -> bool:
    import jax
    return jax.process_index() == 0
