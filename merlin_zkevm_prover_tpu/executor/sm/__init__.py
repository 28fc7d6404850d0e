"""Secondary state machines (reference src/sm/): trace fillers that expand
the Main SM's `required` action lists into per-SM committed columns."""

from .arith_executor import ArithExecutor
from .binary_executor import BinaryExecutor
from .mem_align_executor import MemAlignExecutor
from .memory_executor import MemoryExecutor
from .poseidon_g_executor import PoseidonGExecutor
from .storage_executor import StorageExecutor

__all__ = [
    "ArithExecutor",
    "BinaryExecutor",
    "MemAlignExecutor",
    "MemoryExecutor",
    "PoseidonGExecutor",
    "StorageExecutor",
]
