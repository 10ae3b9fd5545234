"""ntcard-tpu: a TPU-native k-mer cardinality estimation framework.

Capability parity with bcgsc/ntCard v1.2.2 (ntcard + nthll), redesigned for
TPU: batched rolling-hash scan kernels over a packed base stream, pure
functional sketch state merged with collectives, and a host C++/Python I/O
layer. See SURVEY.md for the full blueprint.
"""

import jax

# Exact F1 totals (ntcard.cpp:464-466) and u64 host-side hash assembly need
# 64-bit integers; device kernels pin uint32/int32 explicitly throughout, so
# enabling x64 does not change any kernel dtype.
jax.config.update("jax_enable_x64", True)

__version__ = "1.0.0"
