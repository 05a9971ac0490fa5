"""co_zkvms_tpu — a TPU-native collaborative zkSNARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
ChainSafe/co-zkvms (collaborative Spartan + Jolt zkVM proving over
replicated 3-party secret sharing), built TPU-first:

- BN254 field arithmetic as multi-limb uint32 vector kernels
  (``ops.field``), with a pure-Python ground truth (``ops.ref_field``).
- Multilinear polynomial / sumcheck / grand-product engines as sharded
  array programs (``ops.poly``, ``ops.sumcheck``).
- PST13 multilinear polynomial commitments with Pippenger MSM
  (``ops.curve``, ``ops.msm``, ``ops.pst13``).
- Rep3 MPC expressed as sharded JAX arrays over a ``("party", "chunk")``
  mesh: reshare = ppermute, open = psum (``parallel``).
- Proof systems: Spartan (DFS) and co-Spartan; Jolt zkVM (``models``).
"""

__version__ = "0.1.0"
