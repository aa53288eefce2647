from nucleoatac_tpu.core.chunk import Chunk, ChunkList
from nucleoatac_tpu.core.fragmentsizes import FragmentSizes

__all__ = ["Chunk", "ChunkList", "FragmentSizes"]
