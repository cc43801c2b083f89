"""Quantization core: block formats, vtable, planar TPU packing."""

from .types import (  # noqa: F401
    GGMLType,
    LlamaFType,
    FTYPE_BASE_TYPE,
    TYPE_TRAITS,
    QK_K,
    is_quantized,
    row_size_bytes,
)
from .registry import (  # noqa: F401
    QUANT_FNS,
    dequantize,
    dequantize_bytes,
    quantize,
    quantize_bytes,
)
