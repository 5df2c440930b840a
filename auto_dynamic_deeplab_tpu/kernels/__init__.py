from .confidence import (
    entropy_argmax,
    entropy_argmax_pallas,
    entropy_argmax_reference,
)

__all__ = [
    "entropy_argmax",
    "entropy_argmax_pallas",
    "entropy_argmax_reference",
]
