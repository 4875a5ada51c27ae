"""True multi-process distributed tests (SURVEY.md §4:236-240).

Everything else in the suite runs ONE process on a virtual 8-device CPU
mesh — which never exercises `jax.distributed.initialize`, global arrays
assembled from per-host shards, collectives spanning a process boundary, or
per-host checkpoint shard files. These tests spawn real OS processes
(2 hosts x 4 virtual CPU devices, gloo collectives over localhost) and run
the full scheme list in ``tests/mp_worker.py``. Skipped with a reason if the
sandbox forbids the coordinator socket or gloo rendezvous.

Reference counterpart: none (the reference is single-node single-thread) —
this is the BASELINE.json multi-host obligation's testable half.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")

EXPECTED_MARKERS = [
    "scheme OK: column_sharded_spgemm (per-process container shards)",
    "scheme OK: row_sharded_spgemm(psum_scatter across processes)",
    "scheme OK: overlapped_gather_spgemm (ppermute ring across processes)",
    "scheme OK: sharded LM train step",
    "scheme OK: sharded checkpoint save/restore (per-process shard files)",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    nproc = 2
    try:
        port = _free_port()
    except OSError as e:  # sandbox forbids sockets entirely
        pytest.skip(f"cannot bind localhost socket: {e}")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(port),
         str(tmp_path), REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(nproc)]
    try:
        outs = [p.communicate(timeout=600)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        outs = [p.communicate()[0] for p in procs]
        pytest.fail("multi-process workers timed out:\n"
                    + "\n----\n".join(outs))

    out0 = outs[0]
    if any(p.returncode != 0 for p in procs):
        joined = "\n----\n".join(outs)
        if ("DEADLINE_EXCEEDED" in joined or "UNAVAILABLE" in joined
                or "Gloo" in joined and "connect" in joined.lower()
                and "MPMARK init" not in out0):
            pytest.skip("sandbox blocks the distributed rendezvous:\n"
                        + joined[-2000:])
        pytest.fail("worker failed:\n" + joined)

    for marker in EXPECTED_MARKERS:
        assert marker in out0, (marker, out0)
    assert "MPMARK shutdown clean" in out0
    # process 1 prints no markers (process 0 only) but must exit 0
    assert "MPMARK" not in outs[1]
