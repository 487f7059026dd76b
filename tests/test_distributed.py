"""Multi-host (multi-process) distributed encoding is bit-exact.

Spawns real jax.distributed processes on CPU (SURVEY.md section 4.4's
plan: multiple local processes, no cluster needed). Each process
blockifies only its raster slice and encodes over the global mesh; the
concatenated shard-local outputs must be byte-identical to a
single-process encode of the whole image. Models the reference contract
that any partition of the caller's block loop is valid
(etc2packer.cpp:215-281).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_encode(tmp_path):
    nprocs = 2
    port = _free_port()
    workers = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    for pid in range(nprocs):
        workers.append(subprocess.Popen(
            [sys.executable, "-m", "tests.distributed_worker",
             str(port), str(nprocs), str(pid), str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=1800)
        outs.append(out.decode(errors="replace"))
    for pid, w in enumerate(workers):
        assert w.returncode == 0, f"worker {pid} failed:\n{outs[pid]}"

    # single-process reference encode
    from convectionkernels_tpu import Options, api
    from convectionkernels_tpu.utils import image as image_util
    from tests.distributed_worker import test_image

    img = test_image()
    blocks = image_util.blockify(img)
    expect = np.asarray(api.encode_bc1(blocks, Options()))

    parts = []
    n_blocks = None
    for pid in range(nprocs):
        z = np.load(tmp_path / f"out_{pid}.npz")
        parts.append((int(z["start"]), z["local"]))
        n_blocks = int(z["n_blocks"])
    parts.sort()
    got = np.concatenate([p[1] for p in parts], axis=0)
    assert n_blocks == expect.shape[0]
    assert got.shape == expect.shape
    assert (got == expect).all()

    for pid in range(nprocs):
        full = np.load(tmp_path / f"full_{pid}.npy")
        assert (full == expect).all()
