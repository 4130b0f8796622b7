from .gset import load_gset_laplacian
from .sedumi import SedumiData, Cone

__all__ = ["load_gset_laplacian", "SedumiData", "Cone"]
