from text2loc_tpu.ops.masked import (
    masked_max,
    masked_mean,
    masked_softmax,
    NEG_INF,
)
from text2loc_tpu.ops.fps import farthest_point_sampling
from text2loc_tpu.ops.ballquery import ball_query_knn

__all__ = [
    "masked_max",
    "masked_mean",
    "masked_softmax",
    "NEG_INF",
    "farthest_point_sampling",
    "ball_query_knn",
]
