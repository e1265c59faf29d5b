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


_WORKER_RESUME = textwrap.dedent("""
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

    if sys.argv[6] == "kill":
        # Die right after the first chunk is harvested (and, on the
        # primary, checkpointed): simulates a mid-run preemption at the
        # same point in every process.
        from bayesian_inference_trpl_tpu.parallel import runner as prunner
        orig = prunner.ShardedRunner._chunk_loop
        def _loop(self, dispatch, mat, mag, dtype, n, harvest, progress,
                  start_chunk):
            def harvest2(ci, ll, ok):
                harvest(ci, ll, ok)
                raise SystemExit(17)
            orig(self, dispatch, mat, mag, dtype, n, harvest2, progress,
                 start_chunk)
        prunner.ShardedRunner._chunk_loop = _loop

    cfg = load_config(sys.argv[4])
    P, X, info = bayes(cfg)
    assert info["num_devices"] == 8, info
    np.savez(sys.argv[5] + f".proc{pid}.npz", P=P, X=X)
    print("WORKER_OK", pid)
""")


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """Kill both processes after chunk 0 (checkpoint written by the
    primary), resume, and require the merged (X, P) bitwise equal to an
    uninterrupted single-process run — the broadcast-from-primary resume
    path (pipeline.py; distributed.broadcast_from_primary) that keeps the
    secondary's per-chunk collectives in sync (VERDICT r2, weak #9)."""
    obs, exc = tp._write_synthetic(tmp_path)
    cfg = tp._config(tmp_path, obs, exc, n_points=32)
    cfg.device.chunk_per_device = 2      # chunk=16 over 8 devices: 2 chunks
    cfg.device.n_devices = None
    cfg.paths.out_dirs = [str(tmp_path / "SP")]
    cfg.checkpoint = True
    cfg.resume = True

    P_ref, X_ref, info = tp.bayes(cfg)
    assert info["num_devices"] == 8

    from bayesian_inference_trpl_tpu.config import save_config
    mp_dir = str(tmp_path / "MP")
    cfg.paths.out_dirs = [mp_dir]
    cfg_path = str(tmp_path / "mp_resume.toml")
    save_config(cfg, cfg_path)
    worker = str(tmp_path / "worker_resume.py")
    with open(worker, "w") as f:
        f.write(_WORKER_RESUME)
    out_base = str(tmp_path / "mp_resume_out")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run_phase(mode):
        coord = f"localhost:{_free_port()}"
        procs = [subprocess.Popen(
            [sys.executable, worker, str(pid), coord, REPO, cfg_path,
             out_base, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(2)]
        outs = [p.communicate(timeout=600)[0].decode() for p in procs]
        return procs, outs

    # Phase 1: both processes die after chunk 0.
    procs, outs = run_phase("kill")
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 17, f"proc {pid}: rc={p.returncode}\n{o[-3000:]}"
    # The primary checkpointed exactly one completed chunk.
    from bayesian_inference_trpl_tpu.parallel.checkpoint import (
        CheckpointManager)
    st, P_ck, X_ck, _P_start = CheckpointManager(mp_dir).load()
    assert (st.curve_index, st.chunk_index) == (0, 1)
    assert X_ck.shape == X_ref.shape

    # Phase 2: resume to completion.
    procs, outs = run_phase("resume")
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{o[-3000:]}"
        assert f"WORKER_OK {pid}" in o
    for pid in range(2):
        d = np.load(out_base + f".proc{pid}.npz")
        np.testing.assert_array_equal(d["X"], X_ref)
        np.testing.assert_array_equal(d["P"], P_ref)
