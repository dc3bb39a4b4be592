from . import cells, colors, predicates, projection

__all__ = ["projection", "predicates", "cells", "colors"]
