"""Multimodal (image/audio/video) column plumbing."""

from .binary_ops import (
    attach_binary_payload,
    decode_image,
    extract_features,
    payload_metadata,
    sample_frames,
)

__all__ = [
    "attach_binary_payload",
    "payload_metadata",
    "decode_image",
    "extract_features",
    "sample_frames",
]
