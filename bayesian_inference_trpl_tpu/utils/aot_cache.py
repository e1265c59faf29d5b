"""Persistent EXECUTABLE cache: serialize compiled XLA executables to disk
and reload them in later processes, skipping compilation and tracing.

OPT-IN (TRPL_EXE_CACHE=<dir>), and NOT the right tool on the axon
remote-compile backend: measured r4 on the production chunk program
(2,048 samples, 5 curves), dispatching through the deserialized/
AOT-compiled `Compiled` object cost 330-336 s wall where the plain jit
path cost 49 s — `Compiled.__call__` dispatches synchronously on this
backend, so every chunk launch pays the full tunnel round-trip and the
runner's double-buffered overlap is lost (host user time confirms the
cache works as a cache: 2.5 s vs 19.9 s of tracing/lowering).  On a
standard PJRT backend (local TPU/CPU) Compiled dispatch is the normal
fast path and this cache removes both tracing and compilation from cold
starts.

For THIS environment, cold starts are instead mitigated by the remote
compile server's own cross-process cache: `tools/warmup.py` compiles
the shipped production programs once (e.g. after a code change) so real
runs only pay tracing (~15 s), not compilation (minutes).

Cache keying (when enabled):
  * a source digest of the compute-path modules (models/, ops/,
    parallel/) — a code change invalidates the cache rather than
    silently running stale kernels;
  * shapes + dtypes + shardings of the runtime arguments;
  * the static arguments' repr;
  * jax version, backend, device kind, and process/device counts.

Any failure (backend without serialization support, stale blob, version
skew) falls back to the normal jit path silently — the cache is an
accelerator, never a correctness dependency.
"""
from __future__ import annotations

import hashlib
import logging
import os
import pickle

logger = logging.getLogger(__name__)

_SOURCE_DIGEST = None


def cache_dir() -> str | None:
    d = os.environ.get("TRPL_EXE_CACHE", "")
    if not d or d == "0":
        return None
    return d


def source_digest() -> str:
    """sha1 over the compute-path sources (models/, ops/, parallel/) so a
    code change can never resurrect a stale executable."""
    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is not None:
        return _SOURCE_DIGEST
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha1()
    for sub in ("models", "ops", "parallel"):
        root = os.path.join(pkg, sub)
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(dirpath, f)
                    h.update(p.encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
    _SOURCE_DIGEST = h.hexdigest()
    return _SOURCE_DIGEST


def _arg_signature(args):
    import jax

    parts = []
    for a in jax.tree_util.tree_leaves(args):
        try:
            parts.append(f"{a.dtype}{tuple(a.shape)}{a.sharding}")
        except AttributeError:
            parts.append(repr(a))
    return "|".join(parts)


def _key(statics_repr: str, args) -> str:
    import jax

    h = hashlib.sha1()
    h.update(source_digest().encode())
    h.update(statics_repr.encode())
    h.update(_arg_signature(args).encode())
    dev = jax.devices()[0]
    h.update(f"{jax.__version__}|{jax.default_backend()}|"
             f"{dev.device_kind}|{jax.device_count()}|"
             f"{jax.process_count()}".encode())
    return h.hexdigest()


class AotDispatch:
    """Wrap a jitted function with a process-level executable memo backed
    by the on-disk cache.  One instance per jit function lives at module
    level; calls with the same statics + argument signature share one
    compiled executable (like the jit cache), and a disk hit skips
    compilation entirely in fresh processes.  Falls back to the jitted
    function on any error.

    ``statics`` are keyword arguments bound at lower() time (the jit's
    static_argnames); runtime calls pass only the array arguments.
    """

    def __init__(self, jitfn, label: str = ""):
        self._jit = jitfn
        self._label = label or getattr(jitfn, "__name__", "fn")
        self._memo = {}
        self._failed = False

    def _resolve(self, key: str, statics: dict, args):
        from jax.experimental import serialize_executable as se

        d = cache_dir()
        path = os.path.join(d, f"{self._label}_{key}") if d else None
        if path and os.path.exists(path):
            try:
                # Deserialized blobs execute code on load (pickle): only
                # trust cache files we wrote ourselves.  TRPL_EXE_CACHE
                # must point at a private directory — a shared or
                # attacker-writable dir would be arbitrary code execution
                # (ADVICE r4) — so refuse files not owned by this uid or
                # writable by group/other.
                st = os.stat(path)
                if st.st_uid != os.getuid() or (st.st_mode & 0o022):
                    raise PermissionError(
                        f"untrusted cache file (uid {st.st_uid}, mode "
                        f"{oct(st.st_mode & 0o777)}); expected uid "
                        f"{os.getuid()} and no group/other write")
                with open(path, "rb") as f:
                    blob = pickle.load(f)
                self._memo[key] = se.deserialize_and_load(*blob)
                logger.info("aot_cache: loaded %s", path)
                return
            except Exception as e:  # stale/foreign blob: recompile
                logger.info("aot_cache: reload failed (%s) — recompiling", e)
        comp = self._jit.lower(*args, **statics).compile()
        self._memo[key] = comp
        if path:
            try:
                blob = se.serialize(comp)
                os.makedirs(d, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(blob, f)
                os.chmod(tmp, 0o600)     # see the load-side trust check
                os.replace(tmp, path)
                logger.info("aot_cache: saved %s", path)
            except Exception as e:  # backend without serialization
                logger.info("aot_cache: serialize failed (%s)", e)

    def __call__(self, statics: dict, *args):
        if not self._failed and cache_dir() is not None:
            try:
                key = _key(repr(sorted(statics.items())), args)
                if key not in self._memo:
                    self._resolve(key, statics, args)
                return self._memo[key](*args)
            except Exception as e:
                logger.info("aot_cache: disabled for %s (%s) — falling "
                            "back to jit", self._label, e)
                self._failed = True
        return self._jit(*args, **statics)
