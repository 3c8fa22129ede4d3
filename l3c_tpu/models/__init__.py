from . import dmll, grids, quantizer  # noqa: F401
