from tod_tpu.ops.packing import (  # noqa: F401
    pack_rgb_u32,
    unpack_rgb_u32,
    pack_class_id,
    unpack_class_id,
    class_id_to_u16,
)
from tod_tpu.ops.preprocess import (  # noqa: F401
    preprocess_frame,
    resize_triangle,
    tile_448x224,
    stitch_tiles,
)
from tod_tpu.ops.postprocess import (  # noqa: F401
    semantic_argmax,
    upsample_nearest,
    semantic_postprocess,
)
from tod_tpu.ops.cc_labels import connected_components  # noqa: F401
from tod_tpu.ops.depthwise import depthwise_conv_shifted  # noqa: F401
from tod_tpu.ops.anchors import generate_anchors  # noqa: F401
from tod_tpu.ops.nms import fast_nms  # noqa: F401
from tod_tpu.ops.masks import assemble_masks, crop_masks  # noqa: F401
