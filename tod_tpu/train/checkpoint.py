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
    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    # orbax refuses to overwrite; mirror "save = replace" semantics
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, jax.tree.map(np.asarray, tree))
    ckptr.wait_until_finished()


def load_checkpoint(path: str | pathlib.Path) -> Any:
    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
