"""CLI: ``python -m tod_tpu.bench --config N`` or ``--all``; one JSON line per
config (the repo-root bench.py remains the driver's single-line headline)."""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    from tod_tpu.bench.configs import CONFIGS

    p = argparse.ArgumentParser(description=__doc__)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--config", type=int, choices=sorted(CONFIGS))
    g.add_argument("--all", action="store_true")
    args = p.parse_args(argv)

    # persistent compilation cache (same dir as the repo-root bench.py):
    # config graphs cost minutes of XLA compile per cold run otherwise
    import os

    import jax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tod_tpu.bench import run_config

    todo = sorted(CONFIGS) if args.all else [args.config]
    for n in todo:
        print(json.dumps(run_config(n)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
