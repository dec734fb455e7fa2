from kiez_spark.functions.vectors import (
    cosine_distance,
    dot,
    erfc_expr,
    euclidean,
    l2_norm,
    normal_sf,
    sqeuclidean,
    vec_as_double,
)

__all__ = [
    "cosine_distance",
    "dot",
    "erfc_expr",
    "euclidean",
    "l2_norm",
    "normal_sf",
    "sqeuclidean",
    "vec_as_double",
]
