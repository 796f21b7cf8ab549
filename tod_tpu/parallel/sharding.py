"""Sharding rules: params over tp, batch over dp, jit over the mesh.

Tensor parallelism shards conv kernels on the output-channel axis (the lane
dimension — where the MXU tiles anyway); XLA/GSPMD then propagates the channel
sharding through the network and inserts the all-gathers/reduce-scatters on
ICI.  Data parallelism shards the batch leading axis; gradient psums come from
jit's partitioning of the backward pass.  This is the "pick a mesh, annotate
shardings, let XLA insert collectives" recipe.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, tp_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4 and tp_size > 1 and shape[-1] % tp_size == 0:
        # conv kernel (kh, kw, cin, cout): shard cout over tp
        return P(None, None, None, "tp")
    if len(shape) == 2 and tp_size > 1 and shape[-1] % tp_size == 0:
        # dense kernel (cin, cout)
        return P(None, "tp")
    return P()  # replicate biases, norms, scalars, odd shapes


def param_sharding_tree(tree: Any, mesh: Mesh) -> Any:
    tp_size = mesh.shape["tp"]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, tp_size)), tree
    )


def batch_sharding(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P("dp")), tree)


def state_sharding_tree(state: Any, mesh: Mesh) -> Any:
    """TrainState sharding tree: every leaf (params, opt moments, batch
    stats) per the tp kernel rule, scalars/odd shapes replicated."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, mesh.shape["tp"])), state
    )


def shard_train_step(step: Callable, state, mesh: Mesh):
    """jit ``step`` over the mesh; returns (jitted_step, device_put state).

    State (params/opt/batch-stats) shards per the tp rule; batches shard over
    dp on their leading axis.  Works for any dp×tp factorization including
    (n, 1) pure-DP and (1, n) pure-TP.
    """
    state_shardings = state_sharding_tree(state, mesh)
    state = jax.device_put(state, state_shardings)
    batch_sh = NamedSharding(mesh, P("dp"))
    jitted = jax.jit(
        step,
        in_shardings=(state_shardings, batch_sh),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        # state in == state out shard-for-shard: donate so the optimizer
        # update aliases params/moments in place instead of holding two
        # copies of the state tree live across the step
        donate_argnums=0,
    )
    return jitted, state


def shard_chunk_step(step: Callable, state, mesh: Mesh):
    """jit a ``lax.scan`` of ``step`` over stacked batches on the mesh.

    The multi-chip variant of ``Trainer.train(chunk=N)``: batches arrive
    stacked (chunk, B, ...) — the chunk axis stays unsharded (the scan is
    sequential in it), the batch axis shards over dp, and the TrainState
    carries through the scan with the same shardings as
    :func:`shard_train_step`, so one dispatch advances ``chunk`` optimizer
    steps with all gradient psums riding ICI inside a single XLA program.
    Returns ``(state, metrics_history)`` with each metric stacked (chunk,).
    """
    state_shardings = state_sharding_tree(state, mesh)

    def scan_chunk(st, batches):
        def body(s, b):
            s, m = step(s, b)
            return s, m

        return jax.lax.scan(body, st, batches)

    batch_sh = NamedSharding(mesh, P(None, "dp"))
    return jax.jit(
        scan_chunk,
        in_shardings=(state_shardings, batch_sh),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=0,  # same aliasing argument as shard_train_step
    )


def shard_inference(fn: Callable, mesh: Mesh):
    """jit a (params, batch) -> out function with dp-sharded batches and
    tp-sharded params (batch inference scaling, SURVEY.md §2.5's optional
    multi-chip DP).

    The jitted function is cached per params TREE STRUCTURE, so calling
    ``jit_with(params)`` every frame reuses one compilation — a fresh
    ``jax.jit`` object per call would recompile the whole forward each time.
    """
    batch_sh = NamedSharding(mesh, P("dp"))
    cache: dict = {}

    def jit_with(params):
        key = jax.tree_util.tree_structure(params)
        if key not in cache:
            param_sh = param_sharding_tree(params, mesh)
            cache[key] = jax.jit(fn, in_shardings=(param_sh, batch_sh))
        return cache[key]

    return jit_with
