"""Serialized-program cache (utils/program_cache.py): disk round-trip,
bitwise parity with the plain jit path, and failure fallback."""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_inference_trpl_tpu.utils import program_cache as pc


@partial(jax.jit, static_argnames=("n",))
def _poly(x, y, *, n: int):
    def body(c, _):
        return c * x + y, c.sum()
    c, s = jax.lax.scan(body, x, None, length=n)
    return c, s


def _dispatcher():
    return pc.ProgramDispatch(_poly, label="test_poly")


def test_roundtrip_and_disk_hit(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPL_PROGRAM_CACHE", str(tmp_path))
    x = jnp.asarray(np.linspace(0.1, 0.9, 32, dtype=np.float32))
    y = jnp.float32(0.25)
    statics = dict(n=5)
    want = jax.tree.map(np.asarray, _poly(x, y, **statics))

    d1 = _dispatcher()
    got = d1(statics, x, y)
    blobs = [f for f in os.listdir(tmp_path) if f.endswith(".jaxprog")]
    assert len(blobs) == 1, "export blob not written"
    for w, g in zip(want, jax.tree.map(np.asarray, got)):
        np.testing.assert_array_equal(w, g)

    # Fresh dispatcher (simulates a fresh process): must LOAD, not rebuild.
    d2 = _dispatcher()
    mtime = os.path.getmtime(os.path.join(tmp_path, blobs[0]))
    got2 = d2(statics, x, y)
    assert os.path.getmtime(os.path.join(tmp_path, blobs[0])) == mtime
    for w, g in zip(want, jax.tree.map(np.asarray, got2)):
        np.testing.assert_array_equal(w, g)
    assert pc.build_seconds() > 0.0


def test_key_separates_statics_and_shapes(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPL_PROGRAM_CACHE", str(tmp_path))
    d = _dispatcher()
    x = jnp.ones((8,), jnp.float32)
    d(dict(n=2), x, jnp.float32(1.0))
    d(dict(n=3), x, jnp.float32(1.0))           # different static
    d(dict(n=2), jnp.ones((4,), jnp.float32), jnp.float32(1.0))  # diff shape
    blobs = [f for f in os.listdir(tmp_path) if f.endswith(".jaxprog")]
    assert len(blobs) == 3
    assert len(d._memo) == 3


def test_corrupt_blob_rebuilds(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPL_PROGRAM_CACHE", str(tmp_path))
    x = jnp.ones((8,), jnp.float32)
    d1 = _dispatcher()
    want = jax.tree.map(np.asarray, d1(dict(n=4), x, jnp.float32(2.0)))
    (blob,) = [f for f in os.listdir(tmp_path) if f.endswith(".jaxprog")]
    with open(os.path.join(tmp_path, blob), "wb") as f:
        f.write(b"not a program")
    d2 = _dispatcher()
    got = jax.tree.map(np.asarray, d2(dict(n=4), x, jnp.float32(2.0)))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_disabled_falls_back_to_jit(tmp_path, monkeypatch):
    monkeypatch.setenv("TRPL_PROGRAM_CACHE", "0")
    d = _dispatcher()
    x = jnp.ones((8,), jnp.float32)
    got = d(dict(n=2), x, jnp.float32(1.0))
    want = _poly(x, jnp.float32(1.0), n=2)
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    assert not d._memo and not list(tmp_path.iterdir())


def test_sharded_args_roundtrip(tmp_path, monkeypatch):
    """The production case: args sharded over the sample axis of a mesh
    (the virtual multi-device CPU mesh in tests)."""
    monkeypatch.setenv("TRPL_PROGRAM_CACHE", str(tmp_path))
    from bayesian_inference_trpl_tpu.parallel.mesh import (
        make_mesh, sample_sharding)
    mesh = make_mesh(jax.devices())
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    x = jax.device_put(np.arange(32, dtype=np.float32),
                       sample_sharding(mesh))
    d1 = _dispatcher()
    want = jax.tree.map(np.asarray, d1(dict(n=3), x, jnp.float32(0.5)))
    d2 = _dispatcher()
    got = jax.tree.map(np.asarray, d2(dict(n=3), x, jnp.float32(0.5)))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
