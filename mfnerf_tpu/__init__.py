"""mfnerf_tpu — a TPU-native (JAX/XLA/Pallas) re-implementation of MF-NeRF.

A brand-new framework with the capabilities of lly00412/MF-NeRF (an
Instant-NGP-style NeRF trainer with the Mixed-Feature hash-grid encoding of
arXiv 2304.12587), redesigned for TPU:

* the tinycudann hash / mixed-feature grid encoding is a native JAX gather +
  scatter-add op (``mfnerf_tpu.ops.hashgrid``),
* the CUDA DDA ray march (reference ``models/csrc/raymarching.cu``) is
  re-expressed as a closed-form "t-ladder" + masked occupancy lookup +
  static-shape compaction that XLA fuses (``mfnerf_tpu.ops.ray_march``),
* front-to-back compositing is an associative scan with a hand-derived
  custom VJP (``mfnerf_tpu.ops.composite``),
* data parallelism uses ``jax.sharding`` meshes + ``shard_map``/psum
  (``mfnerf_tpu.parallel``) instead of NCCL DDP.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even under platform plugins that override it (the axon
# TPU plugin in this environment registers itself regardless of the env var;
# explicitly pinning the config restores the standard JAX contract so
# JAX_PLATFORMS=cpu runs never grab the — single-tenant — TPU).
import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    except ImportError:  # pragma: no cover
        pass

MAX_SAMPLES = 1024
NEAR_DISTANCE = 0.01
SQRT3 = 1.7320508075688772
