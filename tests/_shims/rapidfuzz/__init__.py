"""Test shim: satisfies the reference's `from rapidfuzz import fuzz`
import using this repo's own Indel kernels, so the reference pipeline can
execute as a differential-testing oracle. The kernels themselves are
validated separately against the exact float expectations pinned in the
reference's sim_test.py."""
