"""Multi-host scale-out (parallel/distributed.py): a 2-process x 4-device
CPU run must produce the identical (X, P) export to a single-process
8-device run — the SLURM-array replacement with the cross-task merge the
reference never implemented (SURVEY.md section 2.4; bayeslib.py:231).

The multi-process side runs in spawned subprocesses (jax.distributed over
a localhost coordinator, Gloo CPU collectives); the single-process
reference runs in-process on the 8-device virtual mesh.
"""
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import test_pipeline as tp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    pid = int(sys.argv[1])
    os.environ["JAX_COORDINATOR_ADDRESS"] = sys.argv[2]
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    sys.path.insert(0, sys.argv[3])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    from bayesian_inference_trpl_tpu.config import load_config
    from bayesian_inference_trpl_tpu.pipeline import bayes

    cfg = load_config(sys.argv[4])
    P, X, info = bayes(cfg)
    assert info["num_devices"] == 8, info
    # Every process holds the fully merged result (allgathered per chunk).
    np.savez(sys.argv[5] + f".proc{pid}.npz", P=P, X=X)
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    obs, exc = tp._write_synthetic(tmp_path)
    cfg = tp._config(tmp_path, obs, exc, n_points=32)
    cfg.device.chunk_per_device = 2      # chunk=16 over 8 devices: 2 chunks
    cfg.device.n_devices = None
    cfg.paths.out_dirs = [str(tmp_path / "SP")]

    # Single-process 8-device reference (in-process; conftest gives us the
    # 8-device CPU mesh).
    P_ref, X_ref, info = tp.bayes(cfg)
    assert info["num_devices"] == 8

    # Two-process run of the SAME config (fresh out dir).
    from bayesian_inference_trpl_tpu.config import save_config
    cfg.paths.out_dirs = [str(tmp_path / "MP")]
    cfg_path = str(tmp_path / "mp.toml")
    save_config(cfg, cfg_path)
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)
    coord = f"localhost:{_free_port()}"
    out_base = str(tmp_path / "mp_out")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), coord, REPO, cfg_path, out_base],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{o[-3000:]}"
        assert f"WORKER_OK {pid}" in o

    # Both processes hold the identical merged result, equal to the
    # single-process run bit for bit.
    for pid in range(2):
        d = np.load(out_base + f".proc{pid}.npz")
        np.testing.assert_array_equal(d["X"], X_ref)
        np.testing.assert_array_equal(d["P"], P_ref)

    # Only the primary exported BAYRAN files.
    from bayesian_inference_trpl_tpu.utils import io as bio
    P_mp, X_mp = bio.load_bayran(str(tmp_path / "MP"))
    np.testing.assert_array_equal(P_mp, P_ref[0])
    np.testing.assert_array_equal(X_mp, X_ref)
