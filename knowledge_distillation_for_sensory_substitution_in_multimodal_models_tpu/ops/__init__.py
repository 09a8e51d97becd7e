"""TPU compute primitives: attention (XLA reference + Pallas flash kernel),
fused softmax+KL chunks, Prewitt preprocessing kernels."""

from .attention import dot_product_attention

__all__ = ["dot_product_attention"]
