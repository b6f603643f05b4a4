"""zflac_tpu — a TPU-native FLAC (RFC 9639) decode engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
Zig decoder (Senryoku/zflac): `decode(data) -> DecodedFLAC` plus the full
typed error set, scaled from one TPU chip to multi-host pod slices by
sharding frames across a device mesh.

Architecture (two-phase, SURVEY.md §7):
  1. host frame indexer (C++ native, numpy fallback) walks the serial
     bitstream once and emits a *frame table* (plan arrays);
  2. residual unpack + fixed/LPC reconstruction + stereo decorrelation
     run as vectorized int kernels (XLA + Pallas) batched across all
     subframes of the stream, sharded over the mesh for long streams.
"""

from . import format  # noqa: F401
from .errors import (  # noqa: F401
    EndOfStream,
    FlacError,
    InconsistentParameters,
    InvalidChecksum,
    InvalidCodedNumber,
    InvalidFrameHeader,
    InvalidMetadataHeader,
    InvalidResidualCodingMethod,
    InvalidSignature,
    InvalidSubframeHeader,
    MissingStreaminfo,
    Unimplemented,
)
from .result import DecodedFLAC  # noqa: F401

__version__ = "0.1.0"


def decode(data, **kwargs):
    """Decode a FLAC stream (bytes or path) to PCM.

    Production path: host indexer + batched XLA/Pallas reconstruction.
    Mirrors the reference's single public entry point
    (/root/reference/src/zflac.zig:217)."""
    from .runtime.decode import decode as _decode
    if not isinstance(data, (bytes, bytearray, memoryview)):
        with open(data, "rb") as f:
            data = f.read()
    return _decode(bytes(data), **kwargs)


def decode_oracle(data, **kwargs):
    """Decode with the pure-Python scalar oracle (slow; testing)."""
    from .oracle import decode as _decode
    if not isinstance(data, (bytes, bytearray, memoryview)):
        with open(data, "rb") as f:
            data = f.read()
    return _decode(bytes(data), **kwargs)
