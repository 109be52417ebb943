"""depthrenderer_tpu — a TPU-native depth-image novel-view rendering framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
AnthonyDickson/DepthRenderer: colour + depth image → depth-displaced quad-grid mesh →
animated novel views rendered by a tiled software z-buffer rasteriser → PNG frames and
video — fully headless, batched, and shardable over a TPU mesh.

See SURVEY.md for the structural map of the reference and how each component is
re-imagined here.
"""

from . import animation, io, meshgen, tasks, transforms, utils  # noqa: F401
from .scene import Camera, Mesh, Texture  # noqa: F401
from .transforms import Axis  # noqa: F401

__version__ = "0.1.0"
