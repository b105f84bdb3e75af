from .poisson import poisson3d, poisson2d, poisson3d_block, convection_diffusion2d

__all__ = [
    "poisson3d",
    "poisson2d",
    "poisson3d_block",
    "convection_diffusion2d",
]
