"""Multi-host data parallelism: a real 2-process x 4-device CPU cluster.

Exercises count_pipnet_tpu/parallel/distributed.py end-to-end —
jax.distributed.initialize over a localhost coordinator, a global 8-device
mesh spanning both processes, host-local batch feeding via
make_array_from_process_local_data, and a cross-process collective whose
value must agree between processes and match the analytic result
(asserted inside tests/multihost_worker.py).

The reference has no distributed backend (nn.DataParallel only,
reference main.py:75,118); this is the SURVEY.md §5 DCN story.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PYTHONSTARTUP", None)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu",
            "JAX_COMPILATION_CACHE_DIR":
                os.path.join(REPO, ".jax_cache"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    vals, losses = [], []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("PSUM=")]
        assert lines, f"no PSUM line in:\n{out}"
        vals.append(lines[-1])
        step = [l for l in out.splitlines()
                if l.startswith("dryrun_multichip(8): OK")]
        assert step, f"no train-step line in:\n{out}"
        losses.append(step[-1])
    assert vals[0] == vals[1], vals
    # the training loss must be bit-identical on both hosts (replicated
    # params + all-reduced gradients)
    assert losses[0] == losses[1], losses
