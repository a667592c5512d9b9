"""Multi-process (2-controller) execution over jax.distributed.

Round-1 review item 1(ii): `parallel/distributed.py` had no test anywhere.
This spawns two real OS processes, each a separate JAX controller with 4
virtual CPU devices, joined by `jax.distributed.initialize` into one
8-device job (Gloo collectives). The workers run a clustered sharded
annealing through the public API, checkpoint (primary-only write with a
global barrier), resume, and extract the posterior; the parent asserts
both controllers converge to the identical evidence.

This is the CPU stand-in for a multi-host TPU pod: the SPMD partitioning,
collectives, non-addressable-shard handling, and checkpoint gathers take
exactly the same code paths.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "distributed_worker.py"
ANALYTIC_LOGZ = -4 * float(np.log(20.0))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_annealing_and_checkpoint(tmp_path):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    r0, r1 = results
    # Both controllers execute the same SPMD program: identical evidence.
    assert r0["logz"] == r1["logz"]
    assert r0["t"] == r1["t"]
    assert r0["beta"] == 1.0 and r1["beta"] == 1.0
    assert abs(r0["logz"] - ANALYTIC_LOGZ) < 0.5
    assert abs(r0["mean0"]) < 0.5


def _launch(port, tmp_path, mode):
    return [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(port), str(tmp_path), mode],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]


def _collect_results(procs, label, timeout=540):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    results = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{label} worker {i} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))
    return results


@pytest.mark.slow
def test_two_process_midrun_kill_and_resume(tmp_path):
    """Multi-controller elastic-recovery drill (VERDICT r4 item 7): a
    2-process x 4-device job saves a sharded checkpoint mid-run, both
    controllers are SIGKILLed while still sampling, a FRESH pair of
    processes (new coordinator, different ctor seed) resumes from the
    checkpoint — and the completed run must match an uninterrupted run of
    the same seed exactly (identical ladder length and bit-identical
    evidence)."""
    import os
    import time

    # 1) Uninterrupted reference run.
    full = _collect_results(
        _launch(_free_port(), tmp_path / "full", "full"), "full"
    )

    # 2) Interrupted run: wait for both workers' post-save flag files,
    #    then SIGKILL them mid-sampling.
    int_dir = tmp_path / "int"
    int_dir.mkdir()
    procs = _launch(_free_port(), int_dir, "interrupt")
    deadline = time.time() + 540
    flags = [int_dir / "saved_0.flag", int_dir / "saved_1.flag"]
    while not all(f.exists() for f in flags):
        for i, p in enumerate(procs):
            if p.poll() is not None:
                out = p.stdout.read()
                raise AssertionError(
                    f"interrupt worker {i} exited early:\n{out[-4000:]}"
                )
        assert time.time() < deadline, "checkpoint flags never appeared"
        time.sleep(0.5)
    for p in procs:
        p.kill()
    for p in procs:
        p.wait(timeout=60)

    # The sharded checkpoint must be complete and well-formed.
    ckpt = int_dir / "mid.state"
    assert ckpt.is_dir()
    assert (ckpt / "shard_0").is_dir() and (ckpt / "shard_1").is_dir()

    # 3) Fresh processes resume and finish.
    resumed = _collect_results(
        _launch(_free_port(), int_dir, "resume"), "resume"
    )

    # Kill+resume is invisible: exact agreement with the uninterrupted run.
    for rf, rr in zip(full, resumed):
        assert rr["beta"] == 1.0
        assert rr["t"] == rf["t"]
        assert rr["logz"] == rf["logz"]
        assert abs(rr["mean0"] - rf["mean0"]) < 1e-6
