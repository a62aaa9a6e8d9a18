"""Device discovery and capacity checks (ref MuRaL/utils/gpu_utils.py).

The reference scans NVIDIA GPUs via pynvml for one with >= 2.5 GB free
per trial (:5-21) and validates --cuda_id (:23).  The TPU equivalents
report accelerator devices, their HBM stats where the runtime exposes
them, and validate a requested device index.
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def list_devices() -> List:
    import jax
    return jax.devices()


def device_memory_stats(device) -> Optional[dict]:
    try:
        return device.memory_stats()
    except Exception:
        return None


def get_available_device(min_free_gb: float = 2.5):
    """First accelerator with enough free memory (or the first device if
    the runtime exposes no memory stats -- TPU runtimes often don't)."""
    import jax
    devices = jax.devices()
    for d in devices:
        stats = device_memory_stats(d)
        if stats is None:
            return d
        free = stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
        if free >= min_free_gb * 2 ** 30:
            return d
    raise RuntimeError(
        f"no device with >= {min_free_gb} GB free memory found")


def check_device_id(device_id: int):
    import jax
    devices = jax.devices()
    if not 0 <= device_id < len(devices):
        raise ValueError(
            f"device id {device_id} out of range; {len(devices)} "
            f"device(s) available: {devices}")
    return devices[device_id]
