"""tflite → params importer (SURVEY.md §7 "weight loading").

The reference shipped its weights as tflite flatbuffers
(data/FRC_model.tflite / FRC_model_edgetpu.tflite, 141 ops per
data/FRC_model_edgetpu.log:5-20 — CONV_2D×64, DEPTHWISE_CONV_2D×15, …), but
both blobs are stripped from the mount (/root/reference/.MISSING_LARGE_BLOBS).
This module makes parity-vs-original push-button if they ever appear: it walks
a tflite file's conv-type ops in graph order, dequantizes their weights
(scale·(x − zero_point), the same affine dequant the reference applied to its
outputs at src/yolact.rs:172-177), and maps them onto a Flax param tree by
traversal order + shape.

Uses tf.lite.Interpreter for flatbuffer parsing (no hand-rolled schema); TF is
imported lazily so the serving path never pays for it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

# tflite builtin operator codes for ops that carry conv weights


@dataclasses.dataclass
class ConvWeights:
    """One conv-type op's dequantized parameters, in graph (execution) order."""

    op_index: int
    op_name: str  # "CONV_2D" | "DEPTHWISE_CONV_2D" | "FULLY_CONNECTED"
    kernel: np.ndarray  # HWIO float32 (tflite OHWI / depthwise 1HWO transposed)
    bias: np.ndarray | None  # (O,) float32, None if the op has no bias input


def _dequant(arr: np.ndarray, quant: dict) -> np.ndarray:
    """Affine dequantize (src/yolact.rs:172-177's scale·(x−zero_point))."""
    scales = np.asarray(quant.get("scales", ()))
    if arr.dtype in (np.float32, np.float64) or scales.size == 0:
        return np.asarray(arr, np.float32)
    zero_points = np.asarray(quant.get("zero_points", np.zeros_like(scales)))
    axis = int(quant.get("quantized_dimension", 0))
    shape = [1] * arr.ndim
    if scales.size > 1:
        shape[axis] = scales.size
    return (arr.astype(np.float32) - zero_points.reshape(shape)) * scales.reshape(shape)


def read_conv_weights(path: str) -> list[ConvWeights]:
    """Extract every conv-type op's weights from a tflite file, graph order."""
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=str(path))
    details = {d["index"]: d for d in interp.get_tensor_details()}
    out: list[ConvWeights] = []
    for i, op in enumerate(interp._get_ops_details()):  # stable across TF2.x
        name = op["op_name"]
        if name not in ("CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED"):
            continue
        inputs = [t for t in op["inputs"] if t >= 0]
        if len(inputs) < 2:
            continue
        kd = details[inputs[1]]
        kernel = _dequant(interp.get_tensor(kd["index"]), kd["quantization_parameters"])
        bias = None
        if len(inputs) >= 3:
            bd = details[inputs[2]]
            bias = _dequant(interp.get_tensor(bd["index"]), bd["quantization_parameters"])
        if name == "CONV_2D":
            kernel = np.transpose(kernel, (1, 2, 3, 0))  # OHWI → HWIO
        elif name == "DEPTHWISE_CONV_2D":
            # tflite depthwise kernels are (1, H, W, C) with the channel on the
            # LAST axis; a Flax feature_group_count=C conv wants HWIO =
            # (H, W, 1, C) (cin-per-group 1, cout C — see the (3,3,1,8) kernel
            # in models/mobilenetv2.py's depthwise ConvBN).  Depth multipliers
            # >1 are not used by this model family.
            _, h, w, c = kernel.shape
            kernel = kernel.reshape(h, w, c)[:, :, None, :]
        else:  # FULLY_CONNECTED (O, I) → (I, O)
            kernel = kernel.T
        out.append(ConvWeights(op_index=i, op_name=name, kernel=kernel, bias=bias))
    return out


def _flatten_conv_params(
    params: Any, prefix: str = "", parent: dict | None = None
) -> list[tuple[str, dict, dict | None]]:
    """Depth-first list of (path, conv param dict, parent dict) triples.

    The parent dict is the module level holding the conv — where a sibling
    ``BatchNorm_0`` lives for ConvBN blocks (bias redirection below)."""
    found: list[tuple[str, dict, dict | None]] = []
    if isinstance(params, dict):
        if "kernel" in params and hasattr(params["kernel"], "shape"):
            found.append((prefix.rstrip("/"), params, parent))
            return found
        for k in params:  # flax FrozenDict preserves insertion = definition order
            found.extend(_flatten_conv_params(params[k], f"{prefix}{k}/", params))
    return found


def conv_order_from_model(model, input_hw: tuple[int, int] = (64, 64)) -> list[str]:
    """Module-DEFINITION-ordered conv param paths for a Flax model.

    A plain (unjitted) ``model.init`` builds its dict in module creation
    order; any pytree round trip (``jax.jit``, orbax restore, eval_shape)
    returns KEY-SORTED dicts instead, which scrambles traversal order
    ("InvertedResidual_10" < "InvertedResidual_2", "FPN_0" < "MobileNetV2_0")
    and silently breaks order-based weight mapping.  This recovers the true
    order once, cheaply, from the model itself.
    """
    import jax
    import jax.numpy as jnp

    v = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *input_hw, 3), jnp.float32), train=False
    )
    return [name for name, _, _ in _flatten_conv_params(v["params"])]


def map_convs_to_params(
    convs: list[ConvWeights], params: Any, order: list[str] | None = None
) -> tuple[Any, dict]:
    """Assign imported conv weights onto a param tree by order + exact shape.

    Greedy in-order matching: each imported conv claims the first remaining
    param conv whose kernel shape matches exactly.  Returns (new_params,
    report) where report lists mapped/unmapped entries — architecture drift
    shows up as unmapped ops, not silent corruption.

    ``order`` (from :func:`conv_order_from_model`) fixes the slot traversal
    order explicitly.  Without it, the GIVEN tree's iteration order is used —
    correct only for trees that never crossed a pytree round trip (jit /
    checkpoint restore key-sorts dicts; see conv_order_from_model).
    """
    # NOTE: not jax.tree_map — jax pytree flattening SORTS dict keys, which
    # would scramble definition order (e.g. "block_10" < "block_2"); the
    # greedy order-matching below depends on module definition order.
    def _copy(t):
        if isinstance(t, dict) or hasattr(t, "items"):
            return {k: _copy(v) for k, v in t.items()}
        return np.asarray(t)

    params = _copy(params)
    slots = _flatten_conv_params(params)
    if order is not None:
        by_path = {name: (slot, par) for name, slot, par in slots}
        missing = [p for p in order if p not in by_path]
        if missing or len(order) != len(slots):
            raise ValueError(
                f"order/tree mismatch: {len(order)} ordered paths vs "
                f"{len(slots)} tree convs; missing {missing[:3]}"
            )
        slots = [(p, *by_path[p]) for p in order]
    taken = [False] * len(slots)
    mapped, unmapped, dropped_biases = [], [], []
    cursor = 0
    for cw in convs:
        hit = None
        for j in range(cursor, len(slots)):
            if not taken[j] and slots[j][1]["kernel"].shape == cw.kernel.shape:
                hit = j
                break
        if hit is None:
            unmapped.append(f"{cw.op_name}@{cw.op_index} kernel{cw.kernel.shape}")
            continue
        name, slot, parent = slots[hit]
        slot["kernel"] = cw.kernel.astype(slot["kernel"].dtype)
        if cw.bias is not None:
            if "bias" in slot and slot["bias"].shape == cw.bias.shape:
                slot["bias"] = cw.bias.astype(slot["bias"].dtype)
            else:
                # ConvBN blocks: the conv is use_bias=False, but the tflite
                # converter FOLDS BatchNorm into (kernel, bias) — dropping the
                # bias here silently zeroes β−γμ/σ and collapses the network.
                # Route it into the sibling BatchNorm's β instead; with the
                # destination BN at identity (a fresh init — the expected
                # target for importing a pre-folded graph), the result is
                # exactly conv+bias.
                bn = (parent or {}).get("BatchNorm_0")
                if (
                    isinstance(bn, dict)
                    and "bias" in bn
                    and bn["bias"].shape == cw.bias.shape
                ):
                    bn["bias"] = (
                        np.asarray(bn["bias"], np.float32) + cw.bias
                    ).astype(np.float32)
                else:
                    dropped_biases.append(name)
        taken[hit] = True
        cursor = hit + 1  # preserve graph order: later ops map to later convs
        mapped.append(f"{cw.op_name}@{cw.op_index} → {name}")
    report = {
        "mapped": mapped,
        "unmapped_ops": unmapped,
        "unfilled_params": [slots[j][0] for j in range(len(slots)) if not taken[j]],
        "dropped_biases": dropped_biases,
    }
    return params, report


def import_tflite(
    path: str, params: Any, model=None, input_hw: tuple[int, int] = (64, 64)
) -> tuple[Any, dict]:
    """Full pipeline: read conv weights from ``path`` and map onto ``params``.

    Pass ``model`` whenever available: it pins the slot traversal to true
    module-definition order (conv_order_from_model), making the mapping
    correct for jit-initialized / checkpoint-restored trees whose dict keys
    arrive sorted."""
    order = None if model is None else conv_order_from_model(model, input_hw)
    return map_convs_to_params(read_conv_weights(path), params, order=order)
