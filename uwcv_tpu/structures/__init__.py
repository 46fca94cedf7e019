from uwcv_tpu.structures.boxes import (  # noqa: F401
    box_area,
    box_iou,
    clip_boxes,
    decode_deltas,
    encode_deltas,
    nonempty_boxes,
)
from uwcv_tpu.structures.instances import Instances  # noqa: F401
