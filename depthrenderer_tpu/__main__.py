"""``python -m depthrenderer_tpu`` — the single-scene CLI entry point.

Surface parity with ``python -m DepthRenderer`` (reference ``__main__.py:176``).
"""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
