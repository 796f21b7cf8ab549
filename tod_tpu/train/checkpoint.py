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


def _ckpt_fingerprint(path: pathlib.Path) -> str:
    """Cheap change-detection stamp for a checkpoint dir: newest mtime_ns +
    total bytes over its files (orbax writes are save-as-replace via
    save_checkpoint, so any re-pin changes both)."""
    newest, total = 0, 0
    for f in path.rglob("*"):
        if f.is_file():
            st = f.stat()
            newest = max(newest, st.st_mtime_ns)
            total += st.st_size
    return f"{newest}-{total}"


def load_checkpoint(path: str | pathlib.Path, fast: bool = True) -> Any:
    """Restore a checkpoint tree.

    ``fast`` (default): maintain a msgpack sidecar (``<dir>.fast.msgpack``)
    holding the same numpy tree — a single-file flat read that restores in
    a fraction of orbax's directory walk + async layout.  The sidecar is
    keyed to the checkpoint dir's fingerprint and rebuilt transparently when
    the checkpoint changes, so it is a pure boot-time cache (boot-to-first-
    plan's ``checkpoint_and_engine`` stage was a constant ~5.5 s of which
    orbax restore dominated — VERDICT r4 item 7)."""
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
    sidecar = path.with_name(path.name + ".fast.msgpack")
    fp = _ckpt_fingerprint(path) if fast else None
    if fast and sidecar.exists():
        try:
            from flax import serialization

            raw = sidecar.read_bytes()
            blob = serialization.msgpack_restore(raw)
            if blob.get("__fingerprint__") == fp:
                return blob["tree"]
        except Exception:
            pass  # corrupt/stale sidecar: fall through to orbax + rebuild
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(path)
    if fast:
        try:
            from flax import serialization

            tmp = sidecar.with_suffix(".tmp")
            tmp.write_bytes(
                serialization.msgpack_serialize(
                    {"__fingerprint__": fp, "tree": jax.tree.map(np.asarray, tree)}
                )
            )
            tmp.rename(sidecar)  # atomic publish: no torn sidecars
        except Exception:
            pass  # cache write is best-effort; correctness never depends on it
    return tree
