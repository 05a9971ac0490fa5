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

# Persistent XLA compile cache: the limb/point kernels are compiled once per
# (shape, kernel) — without this every process pays minutes of (remote) TPU
# compilation. Opt out with COZK_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("COZK_NO_COMPILE_CACHE"):
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _cache = _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(_cache))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
