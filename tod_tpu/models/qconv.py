"""Int8 quantized convolution — the end-to-end quantized inference path.

The reference's graph is u8-quantized end to end: every tensor in the tflite
blob carries a (scale, zero_point) and the host dequantizes outputs with
``scale * (x - zero_point)`` (src/yolact.rs:172-177; 8.05 MiB u8 blob per
data/README.md:27-32) — and that u8 graph was the reference's *speed* mode,
the reason the Edge TPU could run it at all.  ``Conv8`` is the TPU-native
counterpart: symmetric int8 weights (per output channel) × int8 activations,
accumulated in int32 on the MXU (v5e int8 peak is ~2× its bf16 peak),
dequantized to float once per layer.  Symmetric quantization drops the
zero-points (they exist in tflite because u8 is unsigned); accuracy is
equivalent and the MXU path stays a pure integer matmul.

Three serve paths, keyed on what the param tree carries (no flags — the tree
IS the mode, so one compiled module serves float checkpoints, prepared int8
trees, and mixed trees):

- **static int8** (fast path): the tree holds ``kernel_q`` (s8) + ``w_scale``
  + ``act_scale``, baked once at load by models/prepare.py (BN-folded weights,
  calibration-set activation scales).  Per forward this costs ONE elementwise
  round/clip/cast on the activations, the s8 MXU conv, and one fused rescale —
  no reductions, no weight quantization.
- **float serve**: ``kernel`` stored in a non-f32 dtype (bf16) — plain conv,
  no quantization.  prepare.py uses this for depthwise kernels, whose convs
  are VPU-bound and gain nothing from the int8 MXU path.
- **dynamic** (legacy/calibration): f32 ``kernel`` — weights quantized per
  call, activations per-sample (axis 1..N amax, so a sample's scale never
  depends on its batchmates).  Slower than bf16; kept because calibration
  runs through it (it sows its activation amax into the ``quant_calib``
  collection) and float checkpoints stay directly loadable.

Param names and shapes at init are identical to ``flax.linen.Conv`` ("kernel",
"bias"), so any float checkpoint loads directly.

Backend selection: XLA:TPU lowers s8×s8→s32 ``conv_general_dilated`` onto the
MXU natively; other backends (and interpret-mode tests) use a float-simulated
conv over the *same quantized integer values* — products ≤ 127² are exact in
f32, so the two paths agree to float-accumulation rounding (~1e-7 relative).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def _ste_round(x):
    """round() with a straight-through gradient (identity), the standard QAT
    estimator: the quantizer's staircase has zero gradient a.e., so training
    through real int8 quantization never moves the weights; STE pretends the
    staircase is the identity for the backward pass."""
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def fake_quantize(x, axis=None, bits: int = 8):
    """Quantize→dequantize in float with STE gradients (QAT forward).

    Values are EXACTLY the dequantized int8 grid the inference paths produce
    (same symmetric scale = amax/127 as :func:`quantize_symmetric`); gradients
    are identity inside the clip range and zero outside (clipped STE).  The
    scale is stop-gradient (plain QAT, not learned-scale LSQ).
    """
    qmax = 2 ** (bits - 1) - 1
    amax = jax.lax.stop_gradient(
        jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    )
    scale = jnp.maximum(amax / qmax, 1e-12)
    return jnp.clip(_ste_round(x / scale), -qmax, qmax) * scale


def quantize_symmetric(x, axis=None, bits: int = 8):
    """x f32 → (int8 values, f32 scale broadcastable over x).

    Symmetric signed quantization: scale = amax/127, q = round(x/scale).
    ``axis=None`` → per-tensor; otherwise amax is reduced over ``axis``.
    """
    qmax = 2 ** (bits - 1) - 1
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=axis is not None)
    scale = jnp.maximum(amax / qmax, 1e-12).astype(jnp.float32)
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax).astype(jnp.int8)
    return q, scale


def _int8_conv_supported() -> bool:
    return jax.default_backend() == "tpu"


class Conv8(nn.Module):
    """Drop-in int8 replacement for ``nn.Conv`` (NHWC / HWIO).

    Only the features the YOLACT graph uses are implemented: SAME padding,
    square strides, feature_group_count (depthwise), optional bias.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Any = 1
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    native_int8: bool | None = None  # None = auto (TPU yes, else float-sim)
    # Serve depthwise float convs via the shifted-add formulation
    # (ops/depthwise.py) instead of XLA's transposed-layout depthwise lowering.
    # Only the float-serve branch uses it (the int8 branches keep the conv —
    # an s8 shifted accumulation would have to run in f32 anyway).
    shifted_depthwise: bool = False
    # Quantization-aware training: fake-quantize weights (per-cout) and
    # activations (per-tensor) in float with STE gradients, mirroring the
    # static int8 serve path's quantization layout.  conv_factory("qat").
    qat: bool = False

    def _conv(self, x, kernel, strides, preferred=None):
        kw = dict(
            window_strides=strides,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if preferred is not None:
            kw["preferred_element_type"] = preferred
        return jax.lax.conv_general_dilated(x, kernel, **kw)

    @nn.compact
    def __call__(self, x):
        strides = (
            (self.strides, self.strides) if isinstance(self.strides, int) else tuple(self.strides)
        )
        native = self.native_int8
        if native is None:
            native = _int8_conv_supported()

        # --- static int8 fast path: prepared tree (models/prepare.py) -------
        if self.has_variable("params", "kernel_q"):
            wq = self.get_variable("params", "kernel_q")  # (kh,kw,cin,cout) s8
            sw = self.get_variable("params", "w_scale")  # (cout,) f32
            sx = self.get_variable("params", "act_scale")  # () f32, calibrated
            bias = (
                self.get_variable("params", "bias") if self.use_bias else None
            )
            # quantize in f32: the x·(1/sx) product must be computed at f32
            # before rounding so the chosen bin matches the f32 math used by
            # calibration (prepare.calibrate_amax) and QAT's fake_quantize —
            # a bf16 product carries ~2⁻⁹ relative error, enough to flip the
            # bin for a fraction of top-octave activations.  This pass is
            # memory-bound (read bf16 x, write s8 xq) and the f32 intermediate
            # stays in registers inside the fusion, so compute dtype does not
            # change its traffic.
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / sx)), -127, 127
            ).astype(jnp.int8)
            if native:
                acc = self._conv(xq, wq, strides, preferred=jnp.int32).astype(
                    jnp.float32
                )
            else:
                acc = self._conv(
                    xq.astype(jnp.float32), wq.astype(jnp.float32), strides
                )
            y = acc * (sx * sw.reshape(1, 1, 1, -1))
            if bias is not None:
                y = y + bias
            return y.astype(self.dtype)

        kh, kw_ = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw_, cin, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )

        # --- float serve path: non-f32 kernel = "serve as-is" marker --------
        if kernel.dtype != jnp.float32:
            if (
                self.shifted_depthwise
                and self.feature_group_count == x.shape[-1]
                and strides[0] == strides[1]
                and self.padding == "SAME"
            ):
                from tod_tpu.ops.depthwise import depthwise_conv_shifted

                y = depthwise_conv_shifted(
                    x.astype(kernel.dtype), kernel, strides[0]
                )
            else:
                y = self._conv(x.astype(kernel.dtype), kernel, strides)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y.astype(self.dtype)

        # --- QAT path: fake-quantized float conv, STE gradients -------------
        # Mirrors the static-int8 serve layout (per-cout weight scales,
        # per-tensor activation scale; depthwise stays float exactly as
        # prepare.py serves it), so what trains is what serves.  Sows the
        # same quant_calib amax so post-QAT static preparation works.
        if self.qat:
            xf = x.astype(jnp.float32)
            if not self.is_initializing():
                self.sow(
                    "quant_calib",
                    "amax",
                    jnp.max(jnp.abs(xf)),
                    init_fn=lambda: jnp.float32(0.0),
                    reduce_fn=jnp.maximum,
                )
            depthwise = self.feature_group_count > 1
            if depthwise:
                y = self._conv(xf, kernel, strides)
            else:
                y = self._conv(
                    fake_quantize(xf), fake_quantize(kernel, axis=(0, 1, 2)), strides
                )
            if bias is not None:
                y = y + bias
            return y.astype(self.dtype)

        # --- dynamic path (legacy + calibration) ----------------------------
        wq, sw = quantize_symmetric(kernel, axis=(0, 1, 2))  # (1,1,1,Cout)
        # per-sample activation scales: amax over each image's own axes only,
        # so batched eval matches batch-1 serving bit-for-bit (a global amax
        # made a sample's quantization depend on its batchmates)
        xf = x.astype(jnp.float32)
        sample_axes = tuple(range(1, xf.ndim))
        xq, sx = quantize_symmetric(xf, axis=sample_axes)  # (B,1,1,1)
        # calibration hook: running per-layer activation amax, max-reduced
        # across calls (only records when "quant_calib" is mutable).  Guarded
        # out of init so float/quantized inits create identical trees.
        if not self.is_initializing():
            self.sow(
                "quant_calib",
                "amax",
                jnp.max(jnp.abs(xf)),
                init_fn=lambda: jnp.float32(0.0),
                reduce_fn=jnp.maximum,
            )
        if native:
            acc = self._conv(xq, wq, strides, preferred=jnp.int32).astype(jnp.float32)
        else:
            # float-simulated integer conv: same quantized values, f32 accum
            acc = self._conv(xq.astype(jnp.float32), wq.astype(jnp.float32), strides)
        y = acc * (sx * sw)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def conv_factory(quantized):
    """Returns the conv module class for a quantization mode — ``nn.Conv``
    (bf16 MXU path), :class:`Conv8` (int8 inference), or QAT-flavoured Conv8
    when ``quantized == "qat"``.  All accept the same constructor kwargs used
    across the model family and create identical param trees."""
    if quantized == "qat":
        import functools

        return functools.partial(Conv8, qat=True)
    return Conv8 if quantized else nn.Conv
