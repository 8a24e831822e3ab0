"""Minimal ``libtiff`` stand-in for driving /root/reference unmodified.

The reference reads scenes with ``from libtiff import TIFF;
TIFF.open(path).read_image()`` (function/function.py:34-43); this image
lacks the libtiff package, so the A/B harness (tools/reference_ab.py)
puts this shim on sys.path.  Only the surface the reference touches is
provided, backed by PIL.
"""

import numpy as np
from PIL import Image


class _Tif:
    def __init__(self, path):
        self._path = path

    def read_image(self):
        return np.asarray(Image.open(self._path))


class TIFF:
    @staticmethod
    def open(path, mode="r"):
        return _Tif(path)
