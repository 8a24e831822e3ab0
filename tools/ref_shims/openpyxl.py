"""Minimal ``openpyxl`` stand-in for driving /root/reference unmodified.

The reference's Excel exporter (indicators/kappa.py:87-118) needs
``Workbook``/``load_workbook`` with ``active``/``create_sheet``/
``cell``/``row_dimensions``/``save``; this image lacks openpyxl.  The
A/B harness only consumes the OA/AA/kappa values ``aa_oa`` returns, so
the workbook here just records cells in dicts and ``save`` pickles them
(enough for ``load_workbook`` round-trips across repeats).
"""

import pickle


class _Dim:
    width = 10


class _Dims(dict):
    def __missing__(self, key):
        self[key] = _Dim()
        return self[key]


class _Sheet:
    def __init__(self, title="Sheet"):
        self.title = title
        self.cells = {}
        self.row_dimensions = _Dims()
        self.column_dimensions = _Dims()

    def cell(self, row, column, value=None):
        if value is not None:
            self.cells[(row, column)] = value
        return self


class Workbook:
    def __init__(self):
        self.active = _Sheet()
        self._sheets = [self.active]

    def create_sheet(self, title="Sheet"):
        s = _Sheet(title)
        self._sheets.append(s)
        return s

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self, f)


def load_workbook(path):
    with open(path, "rb") as f:
        return pickle.load(f)
