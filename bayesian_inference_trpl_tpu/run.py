"""Command-line inference entry point.

The TPU-native replacement for running ``parallel_bayes_gpu.py`` as a
script: configuration comes from a TOML file (plus overrides) instead of
in-source edits, paths are arguments instead of hardcoded constants
(the reference documented CLI args it never read; README.md:6,
parallel_bayes_gpu.py:127-131).

Usage:
    python -m bayesian_inference_trpl_tpu.run config.toml \
        [--resume] [--num-points N] [--log-dir Logs]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from datetime import datetime

from .config import load_config, save_config
from .pipeline import bayes


def start_logging(log_dir: str = "Logs"):
    """Timestamped file + stderr logging (reference:
    parallel_bayes_gpu.py:37-57)."""
    os.makedirs(log_dir, exist_ok=True)
    tstamp = str(datetime.now()).replace(":", "-").replace(" ", "_")
    logger = logging.getLogger("bayes-trpl-tpu")
    logger.setLevel(logging.DEBUG)
    fmt = logging.Formatter(fmt="%(asctime)s %(levelname)s: %(message)s",
                            datefmt="%Y-%m-%d %H:%M:%S")
    fh = logging.FileHandler(os.path.join(log_dir, f"{tstamp}.log"))
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setLevel(logging.INFO)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="TOML inference config")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint in the output dir")
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--log-dir", default="Logs")
    ap.add_argument("--dump-config", action="store_true",
                    help="print the resolved config and exit")
    args = ap.parse_args(argv)

    from .utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = load_config(args.config)
    if args.resume:
        cfg.resume = True
    if args.num_points is not None:
        cfg.sim_flags.num_points = args.num_points
    if args.dump_config:
        from .config import dump_config
        print(dump_config(cfg))
        return 0

    logger = start_logging(args.log_dir)
    logger.info("Config: %s", args.config)
    P, X, info = bayes(cfg, logger=logger)
    logger.info("Done: %s", json.dumps(info))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
