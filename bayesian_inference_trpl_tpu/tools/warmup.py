"""Pre-warm the compile cache for a production configuration.

The axon remote-compile backend caches compilations server-side across
processes (measured r4: a fresh process re-running an already-compiled
production program paid ~15 s of host tracing instead of minutes of
compilation), but the FIRST compile after any code or shape change still
costs minutes inside whatever run triggers it.  This tool moves that
cost to an explicit warmup step: it runs the given config's inference
pipeline on exactly ONE chunk of samples per curve — the chunk program
is compiled (and server-cached) for the production shapes, because the
compiled program depends only on the chunk shape (chunk_per_device x
devices), the solver config, and the bucketed horizon, not on
num_points.

Usage (once after install or after changing solver code):

    python -m bayesian_inference_trpl_tpu.tools.warmup examples/power_scan.toml

Subsequent full-scale runs of the same config skip compilation.

Since round 5 this is mostly automatic: the persistent XLA compilation
cache (utils/compile_cache.py) and the serialized-program cache
(utils/program_cache.py) are ON by default, so the first production run
after a code change plays the role of warmup and every later process
starts hot (trace+lower+compile ~117 s -> ~2 s, measured on the shipped
chunk program).  This tool remains the explicit way to pay that
first-run cost at install time instead of inside a production run.
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="production config TOML")
    args = ap.parse_args(argv)
    from . import apply_platform_env
    apply_platform_env()

    from ..config import load_config
    from ..pipeline import bayes

    cfg = load_config(args.config)
    from ..utils.validate import connect_to_devices
    n_dev = len(connect_to_devices(cfg.device))
    chunk = cfg.device.chunk_per_device * n_dev
    cfg.sim_flags.num_points = chunk          # exactly one chunk per curve
    cfg.checkpoint = False
    cfg.resume = False
    with tempfile.TemporaryDirectory() as td:
        cfg.paths.out_dirs = [td]
        t0 = time.time()
        bayes(cfg)
        print(f"warmup: compiled + cached production chunk program(s) for "
              f"{args.config} in {time.time() - t0:.0f}s "
              f"(chunk={chunk}, devices={n_dev})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
