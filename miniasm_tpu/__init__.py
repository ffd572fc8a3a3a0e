"""miniasm_tpu — a TPU-native overlap-layout assembly engine.

A from-scratch JAX/XLA re-design of the capabilities of lh3/miniasm
(reference: /root/reference, v0.3-r179): it consumes all-vs-all read
self-mappings in PAF, performs coverage-based read selection, builds and
cleans a string graph, and emits unitigs as GFA.

Architecture (TPU-first, not a port):
  - hits live as structure-of-array int32/uint32 device columns in HBM;
  - grouping/sorting uses multi-key stable `lax.sort` (no 64-bit keys on
    device);
  - read selection (reference hit.c) is segment-sort + prefix-scan sweeps;
  - hit->arc classification (reference miniasm.h:86-104) is a vectorized
    elementwise kernel;
  - the string graph (reference asg.{h,c}) is CSR-in-HBM; order-independent
    cleaning passes (transitive reduction, weak-overlap drop, multi/asymm
    deletion) run as data-parallel device kernels; order-dependent passes
    (tip/internal/biloop cuts, bubble popping) use device-parallel candidate
    detection with a deterministic sequential commit for bit-parity with the
    reference;
  - multi-chip: hits sharded by read-id over a 1-D `jax.sharding.Mesh`,
    mirrored hits exchanged with all_to_all, stats/convergence via psum.
"""

__version__ = "0.1.0"

from .config import Opt  # noqa: F401
