"""One-time serving-parameter preparation: BN folding + static int8 PTQ.

The reference's u8 tflite graph was its *speed* mode — quantization is why the
Edge TPU could run it at all (/root/reference/data/README.md:27-32; dequant on
host at src/yolact.rs:172-177).  Round 2's Conv8 was a parity mode that
measured *slower* than bf16 because it re-derived everything per forward:
``quantize_symmetric(kernel)`` ran inside every step and each layer took a
global activation amax (a full-tensor reduction that serializes against the
conv).  None of that can constant-fold — params are traced arguments.

This module moves ALL of that work to load time, once:

1. ``fold_batchnorm``     — conv kernels absorb the BN gain (γ/σ) and the BN
   collapses to a pure bias add.  Structure-preserving: the BN variables are
   rewritten to the identity (scale=1, mean=0, var=1−ε) so the param tree —
   and therefore every checkpoint / model definition — is unchanged.
2. ``calibrate_amax``     — run N calibration batches through the dynamic
   quantized graph with a mutable ``quant_calib`` collection; each Conv8 sows
   its running activation amax (max-reduced across batches).
3. ``quantize_prepared``  — per-output-channel symmetric s8 weights + the
   calibrated per-tensor activation scale are baked into the tree:
   ``kernel`` (f32) → ``kernel_q`` (s8) + ``w_scale`` + ``act_scale``.
   Depthwise kernels stay float by default (cast to the serve dtype): the MXU
   int8 path buys nothing for VPU-bound depthwise convs, so quant/requant
   there is pure overhead.

At serve time Conv8's static path is then: one cheap elementwise
round/clip/cast on the activations, an s8×s8→s32 MXU conv, and one fused
rescale — no reductions, no weight work.  See models/qconv.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _is_conv_site(d: dict) -> bool:
    k = d.get("kernel")
    return k is not None and hasattr(k, "ndim") and k.ndim == 4


def fold_batchnorm(variables: Any, eps: float = 1e-5) -> Any:
    """Fold every Conv→BatchNorm pair's BN into the conv kernel.

    Looks for the ConvBN structure (models/mobilenetv2.py: child modules
    "Conv_0" + "BatchNorm_0", conv use_bias=False) and rewrites, per pair:

        kernel' = kernel · γ/√(var+ε)        (broadcast over cout)
        β'      = β − γ·mean/√(var+ε)
        γ' = 1,  mean' = 0,  var' = 1−ε      (identity normalization)

    so BN(conv'(x)) == BN(conv(x)) exactly (up to f32 rounding) while the
    variables tree keeps its exact structure — checkpoints, the Flax module
    definitions, and the quantizer below all see the same tree.  After
    folding, per-channel weight quantization absorbs the BN gain into
    ``w_scale`` (the standard reason folding precedes PTQ).
    """
    params = jax.tree.map(np.asarray, _as_plain_dict(variables["params"]))
    stats = jax.tree.map(np.asarray, _as_plain_dict(variables.get("batch_stats", {})))

    def _walk(p: dict, s: dict) -> None:
        if "Conv_0" in p and "BatchNorm_0" in p and "BatchNorm_0" in s:
            conv, bn, bst = p["Conv_0"], p["BatchNorm_0"], s["BatchNorm_0"]
            gamma = bn["scale"].astype(np.float64)
            beta = bn["bias"].astype(np.float64)
            mean = bst["mean"].astype(np.float64)
            var = bst["var"].astype(np.float64)
            g = gamma / np.sqrt(var + eps)
            conv["kernel"] = (conv["kernel"].astype(np.float64) * g).astype(np.float32)
            bn["bias"] = (beta - mean * g).astype(np.float32)
            bn["scale"] = np.ones_like(bn["scale"])
            bst["mean"] = np.zeros_like(bst["mean"])
            bst["var"] = np.full_like(bst["var"], 1.0 - eps)
        for k, v in p.items():
            if isinstance(v, dict):
                _walk(v, s.get(k, {}) if isinstance(s.get(k), dict) else {})

    _walk(params, stats)
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables:
        out["batch_stats"] = stats
    return out


def calibrate_amax(model, variables: Any, batches) -> dict:
    """Run calibration batches through the dynamic quantized graph; returns the
    ``quant_calib`` tree of per-Conv8 activation amax (max over all batches).

    ``model`` must be the quantized variant (ModelConfig.quantized=True) with
    an UNPREPARED (float-kernel) tree — Conv8's dynamic branch sows the amax
    it computes anyway (models/qconv.py), so calibration costs exactly the
    forwards it runs.
    """
    calib = None
    variables = jax.device_put(variables)  # one upload, not one per batch

    @jax.jit
    def _one(v, x):
        _, mut = model.apply(v, x, train=False, mutable=["quant_calib"])
        return mut["quant_calib"]

    for x in batches:
        got = _one(variables, jnp.asarray(x))
        got = jax.tree.map(np.asarray, _as_plain_dict(got))
        calib = got if calib is None else jax.tree.map(np.maximum, calib, got)
    if calib is None:
        raise ValueError("calibrate_amax: no calibration batches supplied")
    return calib


def quantize_prepared(
    variables: Any,
    calib: dict,
    quantize_depthwise: bool = False,
    serve_dtype=jnp.bfloat16,
) -> Any:
    """Bake static int8 serving parameters into a (BN-folded) variables tree.

    Every 4-D ``kernel`` under params is rewritten in place:

    - dense / pointwise convs → ``kernel_q`` s8 (per-cout symmetric) +
      ``w_scale`` (cout,) f32 + ``act_scale`` () f32 from ``calib``;
    - depthwise convs (cin-per-group == 1) → kernel cast to ``serve_dtype``
      unless ``quantize_depthwise`` (the dtype is the serve-path marker Conv8
      keys on — see models/qconv.py).

    ``calib`` is the tree from :func:`calibrate_amax`; its module paths mirror
    the params tree, so the two are walked together.
    """
    params = jax.tree.map(np.asarray, _as_plain_dict(variables["params"]))

    def _walk(p: dict, c: dict, path: str) -> None:
        for k in list(p.keys()):
            v = p[k]
            if not isinstance(v, dict):
                continue
            if _is_conv_site(v):
                kernel = v["kernel"].astype(np.float32)
                depthwise = kernel.shape[2] == 1 and kernel.shape[3] > 1
                if depthwise and not quantize_depthwise:
                    v["kernel"] = kernel.astype(serve_dtype)
                    continue
                site = c.get(k, {})
                amax_t = site.get("amax")
                if amax_t is None:
                    raise KeyError(
                        f"no calibrated activation amax for conv at {path}{k} "
                        "(was calibrate_amax run on the same model structure?)"
                    )
                w_amax = np.abs(kernel).max(axis=(0, 1, 2))  # per cout
                w_scale = np.maximum(w_amax / 127.0, 1e-12).astype(np.float32)
                kq = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
                act_scale = np.float32(max(float(np.max(amax_t)) / 127.0, 1e-12))
                del v["kernel"]
                v["kernel_q"] = kq
                v["w_scale"] = w_scale
                v["act_scale"] = act_scale
            else:
                _walk(v, c.get(k, {}) if isinstance(c.get(k), dict) else {}, f"{path}{k}/")

    _walk(params, calib, "")
    out = dict(variables)
    out["params"] = params
    return out


def prepare_int8_params(
    model,
    variables: Any,
    calib_batches,
    quantize_depthwise: bool = False,
) -> Any:
    """Fold BN → calibrate → quantize, returning the static-int8 serving tree.

    One-time, at load; the result feeds the same ``model.apply`` (Conv8 keys
    on the prepared leaves).  ``calib_batches`` is an iterable of preprocessed
    input batches (what the model's ``__call__`` takes).
    """
    folded = fold_batchnorm(variables)
    calib = calibrate_amax(model, folded, calib_batches)
    return quantize_prepared(folded, calib, quantize_depthwise=quantize_depthwise)


def _as_plain_dict(tree: Any) -> Any:
    """FrozenDict/dict tree → mutable nested plain dicts (leaves untouched)."""
    if hasattr(tree, "items"):
        return {k: _as_plain_dict(v) for k, v in tree.items()}
    return tree
