"""Serialized-program cache: skip trace+lower on cold starts (DEFAULT ON).

The shipped production chunk program costs ~26 s of jaxpr tracing plus
~14 s of StableHLO lowering per fresh process (the 4-phase fused-horizon
kernel body is traced once per phase with a 6-step unroll — measured r5,
/tmp-profiled down to ``horizon_kernel.one_step``).  The XLA *compile*
leg is already removed by the persistent compilation cache
(utils/compile_cache.py); this module removes the trace+lower leg:

  * first-ever build: ``jax.export.export`` traces + lowers the jitted
    function once (the same work a plain jit call would do) and the
    serialized StableHLO (~1.8 MB for the production chunk program) is
    written to disk;
  * later processes: deserialize (~10 ms), wrap in a NORMAL ``jax.jit``
    — re-tracing the wrapper costs ~0.1 s because the whole program is
    one staged call — and compile via the persistent cache (~2 s).

Measured r5 cold-path totals for the production chunk program (1,024
samples x 80,000-step horizon, fused_horizon_chord):

  | leg | no caches | program cache + XLA cache |
  |---|---|---|
  | trace + lower | 40.9 s | 0.1 s |
  | compile | 76.5 s | 2.0 s |

Crucially the cached program dispatches through the ordinary jit path,
so dispatch stays ASYNC and the runner's double-buffered chunk overlap
survives.  The round-4 attempt (utils/aot_cache.py, since removed)
serialized compiled *executables* instead; their deserialized
``Compiled`` objects dispatch synchronously on the axon backend and
made end-to-end runs 7x SLOWER — that is why this cache stores lowered
programs, not executables.

Cache keying (a stale or foreign entry must never run silently):
  * sha1 of the compute-path sources (models/, ops/, parallel/);
  * the static arguments' repr and the runtime arguments'
    shapes/dtypes/shardings;
  * jax version, backend, device kind, device/process counts.

jax.export blobs are StableHLO + metadata parsed by jax's own
deserializer — no pickle, no code execution on load.  Disable with
TRPL_PROGRAM_CACHE=0, relocate with TRPL_PROGRAM_CACHE=<dir> (default
$XDG_CACHE_HOME/bayesian-inference-trpl/programs).  Any failure falls
back to the plain jit call — the cache is an accelerator, never a
correctness dependency.
"""
from __future__ import annotations

import hashlib
import logging
import os
import threading
import time

logger = logging.getLogger(__name__)

_SOURCE_DIGEST = None

# Cumulative seconds spent building programs (export trace+lower, blob
# IO, wrapper compile) since process start — lets bench.py and bayes()
# report the cold-start split as first-class numbers.
_BUILD_SECONDS = 0.0
_BUILD_LOCK = threading.Lock()


def build_seconds() -> float:
    return _BUILD_SECONDS


def _add_build_seconds(dt: float) -> None:
    global _BUILD_SECONDS
    with _BUILD_LOCK:
        _BUILD_SECONDS += dt


def cache_dir() -> str | None:
    d = os.environ.get("TRPL_PROGRAM_CACHE", "")
    if d == "0":
        return None
    if not d:
        from .compile_cache import default_cache_root
        d = os.path.join(default_cache_root(), "programs")
    return d


def source_digest() -> str:
    """sha1 over the compute-path sources (models/, ops/, parallel/) so a
    code change can never resurrect a stale program."""
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


class ProgramDispatch:
    """Wrap a jitted function with a process-level memo backed by the
    on-disk serialized-program cache.  One instance per jit function
    lives at module level; calls with the same statics + argument
    signature share one program, and a disk hit skips tracing and
    lowering entirely in fresh processes.

    ``statics`` are keyword arguments bound at export time (the jit's
    static_argnames); runtime calls pass only the array arguments.
    """

    def __init__(self, jitfn, label: str = ""):
        self._jit = jitfn
        self._label = label or getattr(jitfn, "__name__", "fn")
        self._memo = {}
        self._failed = False

    def _resolve(self, key: str, statics: dict, args):
        import jax

        from .compile_cache import enable_compile_cache
        enable_compile_cache()    # the wrapper compile leg rides this
        d = cache_dir()
        path = os.path.join(d, f"{self._label}_{key}.jaxprog") if d else None
        exported = None
        if path and os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exported = jax.export.deserialize(bytearray(f.read()))
                logger.info("program_cache: loaded %s", path)
            except Exception as e:      # stale/corrupt blob: rebuild
                logger.info("program_cache: reload failed (%s) — "
                            "rebuilding", e)
                exported = None
        if exported is None:
            exported = jax.export.export(self._jit)(*args, **statics)
            if path:
                try:
                    blob = exported.serialize()
                    os.makedirs(d, exist_ok=True)
                    tmp = path + f".tmp{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                    logger.info("program_cache: saved %s (%.1f MB)", path,
                                len(blob) / 1e6)
                except Exception as e:
                    logger.info("program_cache: serialize failed (%s)", e)
        fn = jax.jit(exported.call)
        self._memo[key] = fn
        return fn

    def __call__(self, statics: dict, *args):
        if not self._failed and cache_dir() is not None:
            try:
                key = _key(repr(sorted(statics.items())), args)
                fn = self._memo.get(key)
                if fn is not None:
                    return fn(*args)
                t0 = time.perf_counter()
                fn = self._resolve(key, statics, args)
                # The wrapper's (cheap, single-staged-call) trace and its
                # (persistent-cache-backed) compile happen inside this
                # first dispatch; its wall time IS the program build time
                # (dispatch enqueue is async and costs ~ms on top).
                out = fn(*args)
                _add_build_seconds(time.perf_counter() - t0)
                return out
            except Exception as e:
                logger.info("program_cache: disabled for %s (%s) — falling "
                            "back to jit", self._label, e)
                self._failed = True
        return self._jit(*args, **statics)
