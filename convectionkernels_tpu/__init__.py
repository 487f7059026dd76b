"""convectionkernels_tpu — TPU-native texture block compression.

A brand-new JAX/XLA/Pallas framework with the capabilities of
elasota/ConvectionKernels (CVTT): BC1-BC7, ETC1/ETC2/EAC encoding of 4x4
pixel blocks, bit-identical to the reference's scalar build at equal options.
"""

from .api import (encode_bc1, encode_bc2, encode_bc3, encode_bc4s,
                  encode_bc4u, encode_bc5s, encode_bc5u)
from .options import Flags, Options

__all__ = [
    "Flags",
    "Options",
    "encode_bc1",
    "encode_bc2",
    "encode_bc3",
    "encode_bc4s",
    "encode_bc4u",
    "encode_bc5s",
    "encode_bc5u",
]
