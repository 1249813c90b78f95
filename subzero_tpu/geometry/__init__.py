from .polygon import (
    apply_padding,
    pad_polygon,
    pad_polygons,
    points_in_polygon,
    poly_angles,
    poly_area,
    poly_centroid,
    poly_edges,
    poly_inertia_z,
    poly_moments,
    poly_rmax,
)
from .clip import OverlapStats, difference_stats, intersection_area, overlap_stats

__all__ = [
    "apply_padding",
    "pad_polygon",
    "pad_polygons",
    "points_in_polygon",
    "poly_angles",
    "poly_area",
    "poly_centroid",
    "poly_edges",
    "poly_inertia_z",
    "poly_moments",
    "poly_rmax",
    "OverlapStats",
    "difference_stats",
    "intersection_area",
    "overlap_stats",
]
