from ripcurrents_tpu.ops.image import (  # noqa: F401
    bgr_to_gray,
    resize_area,
    resize_bilinear,
)
from ripcurrents_tpu.ops.polar import cart_to_polar, polar_to_cart  # noqa: F401
