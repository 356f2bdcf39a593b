from .adapt import AdaptConfig
from .nuts import ChunkBuffers, NutsConfig
from .run import init_chains, make_chunk_runner, resolve_dtype

__all__ = [
    "AdaptConfig",
    "ChunkBuffers",
    "NutsConfig",
    "init_chains",
    "make_chunk_runner",
    "resolve_dtype",
]
