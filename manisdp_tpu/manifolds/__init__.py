from .base import Manifold
from .oblique import Oblique
from .sphere import Sphere
from .euclidean import Euclidean

__all__ = ["Manifold", "Oblique", "Sphere", "Euclidean"]
