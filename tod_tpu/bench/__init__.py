"""Runnable benchmarks for the five BASELINE.json configs (SURVEY.md §7).

Each config is a callable returning one JSON-able dict (metric/value/unit),
mirroring the repo-root ``bench.py`` contract; ``python -m tod_tpu.bench
--config N`` runs one, ``--all`` runs every config.
"""

from tod_tpu.bench.configs import CONFIGS, run_config, transport_rtt_ms

__all__ = ["CONFIGS", "run_config", "transport_rtt_ms"]
