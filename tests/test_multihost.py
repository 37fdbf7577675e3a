"""initialize_distributed, driven for real (VERDICT r3 item 8).

Two actual OS processes initialize jax.distributed over a localhost
coordinator on the CPU backend, then allgather their process indices —
exercising the coordinator handshake, global device visibility, and a
cross-process collective. Everything else in parallel/ is tested on the
virtual 8-device mesh; this is the one seam that needs real processes.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")   # axon plugin ignores env var
from odevit_tpu.parallel.multihost import (initialize_distributed,
                                           process_local_batch_slice)

coord, pid = sys.argv[1], int(sys.argv[2])
initialize_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 2 * len(jax.local_devices())

from jax.experimental import multihost_utils
import numpy as np
got = multihost_utils.process_allgather(np.array([jax.process_index()]))
assert got.reshape(-1).tolist() == [0, 1], got

sl = process_local_batch_slice(8)
assert (sl.start, sl.stop) == (pid * 4, pid * 4 + 4)
print("WORKER_OK", pid)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_initialize_distributed_two_processes():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=env) for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} rc={p.returncode}\n{out}\n{err}"
        assert f"WORKER_OK {pid}" in out


def test_env_var_fallbacks_single_process_noop():
    """NUM_PROCESSES<=1 -> no-op (host-count-agnostic scripts)."""
    from odevit_tpu.parallel.multihost import initialize_distributed
    old = os.environ.pop("NUM_PROCESSES", None)
    try:
        initialize_distributed()   # must not try to reach a coordinator
    finally:
        if old is not None:
            os.environ["NUM_PROCESSES"] = old
