from .decomposition import DomainDecomposition, make_mesh

__all__ = ["DomainDecomposition", "make_mesh"]
