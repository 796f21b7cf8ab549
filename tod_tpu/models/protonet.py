"""ProtoNet: the prototype-mask branch of YOLACT.

The reference's compile log shows the protonet's TANH×5 nonlinearities
(SURVEY.md §2.3); the blob's only consumed output was a downstream 28×28×81 map
(src/yolact.rs:91).  We build the real thing per the YOLACT paper: a small FCN on
P3, one 2× upsample, and a final 1×1 conv to K prototype channels (ReLU so
prototypes are non-negative and unbounded, as the paper found best).
Output resolution is input/4 (e.g. 64×80 for a 256×320 input).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ProtoNet(nn.Module):
    num_prototypes: int = 32
    channels: int = 128
    dtype: Any = jnp.bfloat16
    quantized: bool = False

    @nn.compact
    def __call__(self, p3):
        from tod_tpu.models.qconv import conv_factory

        def conv(f, k=3, name=None):
            return conv_factory(self.quantized)(
                f, (k, k), padding="SAME", dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )

        x = p3
        for i in range(3):
            x = nn.relu(conv(self.channels, name=f"conv{i}")(x))
        b, h, w, c = x.shape
        # dtype-preserving 2× bilinear (exact 2-tap weights in bf16); the f32
        # round trip doubled the bytes moved at protonet's resolution
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        x = nn.relu(conv(self.channels, name="post_up")(x))
        # final prototypes in f32 — they feed the mask-assembly GEMM
        x = conv(self.num_prototypes, k=1, name="proto_out")(x)
        return nn.relu(x.astype(jnp.float32))
