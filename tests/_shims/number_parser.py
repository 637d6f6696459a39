"""Test shim: satisfies the reference's `from number_parser import parse`
import with this repo's number-word rewriter."""
from bib_dedupe_spark.kernels.numwords import parse  # noqa: F401
