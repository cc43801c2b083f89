"""TPU compute ops: quantized matmul, norms, RoPE, attention, activations."""

from .qtensor import QTensor  # noqa: F401
from .qmatmul import q_matmul  # noqa: F401
