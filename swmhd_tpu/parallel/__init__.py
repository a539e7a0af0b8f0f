from .decomposition import DomainDecomposition, make_mesh
from .multihost import initialize, make_pod_mesh, process_local_slab

__all__ = ["DomainDecomposition", "make_mesh",
           "initialize", "make_pod_mesh", "process_local_slab"]
