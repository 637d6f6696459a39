from bib_dedupe_spark.kernels.fuzz import (  # noqa: F401
    partial_ratio,
    ratio,
    token_set_ratio,
    token_sort_ratio,
)
