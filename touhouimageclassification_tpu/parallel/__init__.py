"""Mesh/sharding helpers — the component that replaces a GPU rebuild's NCCL
backend (SURVEY §5 "Distributed communication backend"): JAX compiled
collectives over ICI/DCN via ``jax.sharding``."""
from .mesh import create_mesh, data_sharding, replicated
from .dist import initialize_distributed

__all__ = ["create_mesh", "data_sharding", "replicated", "initialize_distributed"]
