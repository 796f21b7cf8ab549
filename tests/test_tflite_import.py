"""tflite importer tests (SURVEY.md §7 "weight loading").

The reference blobs are stripped from the mount, so the round-trip test builds
its own tiny tflite via the TF converter; a second test targets the real blob
path and skips while it is absent (push-button parity if it ever appears).
"""

import pathlib

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tod_tpu.models.tflite_import import import_tflite, read_conv_weights  # noqa: E402

REF_BLOB = pathlib.Path("/root/reference/data/FRC_model.tflite")


@pytest.fixture(scope="module")
def tiny_tflite(tmp_path_factory):
    """conv → depthwise → conv, float32 tflite, with known weights."""
    rng = np.random.default_rng(0)
    tf.keras.utils.set_random_seed(0)
    model = tf.keras.Sequential(
        [
            tf.keras.layers.Input((16, 16, 3)),
            tf.keras.layers.Conv2D(8, 3, padding="same", name="c1"),
            tf.keras.layers.DepthwiseConv2D(3, padding="same", name="dw"),
            tf.keras.layers.Conv2D(4, 1, padding="same", name="c2"),
        ]
    )
    for layer in model.layers:
        ws = [rng.normal(size=w.shape).astype(np.float32) for w in layer.get_weights()]
        layer.set_weights(ws)
    blob = tf.lite.TFLiteConverter.from_keras_model(model).convert()
    path = tmp_path_factory.mktemp("tfl") / "tiny.tflite"
    path.write_bytes(blob)
    return str(path), model


def test_read_conv_weights_order_and_values(tiny_tflite):
    path, model = tiny_tflite
    convs = read_conv_weights(path)
    names = [c.op_name for c in convs]
    assert names == ["CONV_2D", "DEPTHWISE_CONV_2D", "CONV_2D"]
    # tflite CONV_2D kernels come back HWIO after the importer's transpose
    k1 = model.get_layer("c1").get_weights()[0]  # keras HWIO already
    np.testing.assert_allclose(convs[0].kernel, k1, rtol=1e-6)
    kd = model.get_layer("dw").get_weights()[0]  # keras (H, W, C, 1)
    np.testing.assert_allclose(convs[1].kernel, kd, rtol=1e-6)
    b2 = model.get_layer("c2").get_weights()[1]
    np.testing.assert_allclose(convs[2].bias, b2, rtol=1e-6)


def test_map_onto_flax_param_tree(tiny_tflite):
    path, model = tiny_tflite
    # a Flax param tree with the same conv shapes, definition order c1→dw→c2
    params = {
        "c1": {"kernel": np.zeros((3, 3, 3, 8), np.float32), "bias": np.zeros(8, np.float32)},
        "dw": {"kernel": np.zeros((3, 3, 8, 1), np.float32), "bias": np.zeros(8, np.float32)},
        "c2": {"kernel": np.zeros((1, 1, 8, 4), np.float32), "bias": np.zeros(4, np.float32)},
    }
    new, report = import_tflite(path, params)
    assert not report["unmapped_ops"], report
    assert not report["unfilled_params"], report
    np.testing.assert_allclose(
        new["c1"]["kernel"], model.get_layer("c1").get_weights()[0], rtol=1e-6
    )
    np.testing.assert_allclose(
        new["c2"]["bias"], model.get_layer("c2").get_weights()[1], rtol=1e-6
    )


def test_quantized_weights_dequantize(tiny_tflite, tmp_path):
    """int8 PTQ blob → importer returns float weights close to the originals
    (the reference graph is u8 end-to-end, src/yolact.rs:172-177)."""
    path, model = tiny_tflite
    conv = tf.lite.TFLiteConverter.from_keras_model(model)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    qpath = tmp_path / "tiny_q.tflite"
    qpath.write_bytes(conv.convert())
    convs = read_conv_weights(str(qpath))
    k1 = model.get_layer("c1").get_weights()[0]
    got = next(c for c in convs if c.kernel.shape == k1.shape).kernel
    # int8 weight quantization error band
    np.testing.assert_allclose(got, k1, atol=np.abs(k1).max() / 100)


@pytest.mark.skipif(not REF_BLOB.exists(), reason="reference blob stripped from mount")
def test_reference_blob_maps_onto_flagship():
    """Push-button parity check if data/FRC_model.tflite ever appears."""
    import jax

    from tod_tpu.core.config import ModelConfig
    from tod_tpu.models import create_model

    model, _ = create_model(ModelConfig(input_size=(224, 224)))
    import jax.numpy as jnp

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3), jnp.bfloat16), train=False)
    )(jax.random.PRNGKey(0))
    _, report = import_tflite(str(REF_BLOB), variables["params"])
    assert len(report["mapped"]) > 0
