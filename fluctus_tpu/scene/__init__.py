from .scene import Scene, ModelTransform  # noqa: F401
from .material import HostMaterial  # noqa: F401
