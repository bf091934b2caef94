"""wsiseg_tpu — a TPU-native whole-slide-image analysis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``acproject/wsi-segmentation-pipeline`` (breast-pathology WSI patch
classification, cellularity regression, dense segmentation / tumor-bed
detection, and region-proposal ensembles), designed TPU-first:

- models are flax modules compiled once under ``jax.jit`` (NHWC, bf16 compute);
- dense whole-slide inference keeps the slide *level image* resident in HBM
  and gathers tiles on-device, so the per-tile host round-trip of the
  reference (``utils/eval.py:213-215`` in the reference) disappears;
- multi-chip scaling uses ``jax.sharding.Mesh`` + collectives over ICI;
- host-side slide decode is a first-party C++ TIFF/SVS tile reader
  (``native/``) instead of OpenSlide.
"""

__version__ = "0.1.0"

from wsiseg_tpu.config import Config, default_config  # noqa: F401
