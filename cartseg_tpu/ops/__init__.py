"""Device-side image ops: EDT, morphology, connected components, edge
maps, resize — the jnp/Pallas equivalents of the reference's scipy/cv2
host calls (SURVEY.md section 2.6)."""

from cartseg_tpu.ops.edt import edt, distance_transform_edt
from cartseg_tpu.ops.morphology import (
    erode, dilate, morph_open, morph_close,
    fill_holes_from_border, fill_small_holes,
)
from cartseg_tpu.ops.connected_components import (
    connected_components, keep_largest_component, remove_small_components,
    count_components,
)
from cartseg_tpu.ops.edges import (sobel_edges, canny_edges,
                                    mask_boundary, edge_hit_rate)

__all__ = [
    "edt", "distance_transform_edt",
    "erode", "dilate", "morph_open", "morph_close",
    "fill_holes_from_border", "fill_small_holes",
    "connected_components", "keep_largest_component",
    "remove_small_components", "count_components",
    "sobel_edges", "canny_edges", "mask_boundary", "edge_hit_rate",
]
