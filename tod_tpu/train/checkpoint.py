"""Checkpoint save/restore via orbax (SURVEY.md §5 "Checkpoint / resume":
the reference has none — weights were a frozen flatbuffer on disk; we persist
trained params + batch stats and restore them for inference or resume)."""

from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str | pathlib.Path, tree: Any) -> None:
    """Save-as-replace, crash-safe: orbax refuses to overwrite, and naively
    rmtree-ing the old checkpoint before saving would destroy it if the
    process dies mid-save (the best-checkpoint keeper overwrites the same
    path for hours of training).  Write to a sibling temp dir, then swap —
    at every instant at least one complete checkpoint exists on disk."""
    import shutil

    path = pathlib.Path(path).absolute()
    tmp = path.with_name(path.name + ".saving")
    old = path.with_name(path.name + ".replaced")
    for stale in (tmp, old):
        if stale.exists():
            shutil.rmtree(stale)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, jax.tree.map(np.asarray, tree))
    ckptr.wait_until_finished()
    if path.exists():
        path.rename(old)
    tmp.rename(path)
    if old.exists():
        shutil.rmtree(old)


def pinned_checkpoint() -> str | None:
    """The repo's pinned production checkpoint directory, or None.

    Preference order: ``checkpoints/yolact_dr`` (domain-randomized — detects
    the reference's REAL photo fixtures as well as the procedural domain;
    round-4 campaign, checkpoints/README.md) over ``checkpoints/yolact_synth``
    (round-2, procedural-domain-only — kept for the int8/QAT provenance
    gates).  Single source of truth for every default-weights consumer
    (app, bench, deploy, sim, boot)."""
    root = pathlib.Path(__file__).resolve().parents[2] / "checkpoints"
    for name in ("yolact_dr", "yolact_synth"):
        p = root / name
        if p.exists():
            return str(p)
    return None


def load_checkpoint(path: str | pathlib.Path) -> Any:
    path = pathlib.Path(path).absolute()
    if not path.exists():
        # crash-window recovery: a save interrupted mid-swap leaves the new
        # complete checkpoint at .saving (post-save, pre-rename) or the old
        # one at .replaced — prefer the newer
        for alt in (path.with_name(path.name + ".saving"),
                    path.with_name(path.name + ".replaced")):
            if alt.exists():
                path = alt
                break
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
