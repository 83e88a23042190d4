"""Spark layer: DataFrame-in/DataFrame-out stages wrapping the kernels."""

from .lsh import LSHConfig, add_band_signatures  # noqa: F401
from .mask import mask, mask_b64  # noqa: F401
from .match import match_crosswise, match_lsh, match_pairwise, top_k_per_record  # noqa: F401
from .session import get_spark  # noqa: F401
from .transform import transform  # noqa: F401
