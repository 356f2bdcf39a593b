from .mesh import chain_mesh, initialize_distributed, shard_chains

__all__ = ["chain_mesh", "shard_chains", "initialize_distributed"]
