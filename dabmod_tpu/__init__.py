"""dabmod_tpu: a TPU-native DAB (ETSI EN 300 401) modulation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ODR-DabMod:
ETI/EDI ingest, the full EN 300 401 COFDM transmit chain as fused batched
device kernels, and a streaming runtime with remote control -- scaled over
device meshes by sharding the transmission-frame (time) axis.
"""

__version__ = "0.1.0"

from . import tables  # noqa: F401
from .config import ModSettings, parse_ini  # noqa: F401
from .eti import (EnsembleLayout, EtiFrameBatch, parse_eti_frames,  # noqa: F401
                  synth_eti_batch)
