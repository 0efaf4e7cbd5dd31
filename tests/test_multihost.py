"""Multi-host DP integration: 2 real processes, jax.distributed, one global
mesh, global batch assembled from per-process shards — loss must equal the
single-process run on the same global batch (SURVEY §7 step 6)."""

import os
import pathlib
import re
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "multihost_smoke.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # persistent compile cache: repeat suite runs skip the XLA compiles
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/sdumc_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    return env


def _parse(out: str):
    m = re.search(
        r"MULTIHOST_LOOP pid=\d+ nproc=\d+ train_mse=([-\d.]+) "
        r"test_mae=([-\d.]+) eval_mse=([-\d.]+)", out)
    assert m, out
    return tuple(float(g) for g in m.groups())


def test_two_process_full_loop_matches_single_process():
    """Full train() epoch driver on 2 real processes (sharded BatchIterator,
    make_array_from_process_local_data, gathered eval): both processes must
    report IDENTICAL metrics, close to the single-process run on the same
    synthetic data."""
    port = _free_port()

    # single-process reference runs inline: this test process already has
    # the 8-device CPU mesh (conftest), saving a third jax startup
    import argparse
    import contextlib
    import importlib.util
    import io

    spec = importlib.util.spec_from_file_location("mh_smoke", SCRIPT)
    smoke = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smoke)
    import jax

    from sdumc_tpu.parallel import make_mesh

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        smoke.run_full_loop(
            make_mesh(data_parallel=4, model_parallel=1),
            argparse.Namespace(pid=0, nproc=1),
        )
    ref = _parse(buf.getvalue())

    def launch_pair(port):
        procs = [
            subprocess.Popen(
                [sys.executable, str(SCRIPT), "--nproc", "2", "--pid", str(pid),
                 "--coordinator", f"127.0.0.1:{port}", "--local_devices", "2",
                 "--mode", "loop"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=_env(),
            )
            for pid in (0, 1)
        ]
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                for q in procs:
                    q.kill()
                return None, err[-2000:]
            outs.append(out)
        return outs, None

    # retries on fresh ports: under heavy host load the distributed
    # coordinator handshake can time out spuriously
    outs, err = launch_pair(port)
    for _ in range(2):
        if outs is not None:
            break
        outs, err = launch_pair(_free_port())
    assert outs is not None, err

    m0, m1 = _parse(outs[0]), _parse(outs[1])
    assert m0 == m1, (m0, m1)  # all-reduce/gather makes them identical
    # shard->host assignment shifts dropout draws; metrics stay close
    for got, want in zip(m0, ref):
        assert abs(got - want) < 0.05, (m0, ref)
