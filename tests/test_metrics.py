"""Metric parity vs. numpy re-derivation of the reference formulas
(indicators/kappa.py:10-84) and workbook round-trips."""

import numpy as np
import jax.numpy as jnp

from dmfusion.ops.metrics import aa_oa, confusion_matrix, kappa, render_class_map
from dmfusion.report.excel import Workbook, expo_result


def _ref_kappa(matrix):
    n = np.sum(matrix)
    sum_po = sum(matrix[i][i] for i in range(len(matrix)))
    sum_pe = sum(np.sum(matrix[i, :]) * np.sum(matrix[:, i])
                 for i in range(len(matrix)))
    po, pe = sum_po / n, sum_pe / (n * n)
    return (po - pe) / (1 - pe)


def test_confusion_matrix_orientation(rng):
    c = 5
    pred = rng.integers(0, c, 200)
    target = rng.integers(1, c, 200)
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(target), c))
    want = np.zeros((c, c))
    for p, t in zip(pred, target):
        want[p][t] += 1  # reference orientation: [pred][target]
    np.testing.assert_array_equal(got, want)


def test_confusion_matrix_mask(rng):
    c = 3
    pred = jnp.asarray([0, 1, 2, 1])
    target = jnp.asarray([0, 1, 2, 1])
    mask = jnp.asarray([True, True, False, False])
    got = np.asarray(confusion_matrix(pred, target, c, mask))
    assert got.sum() == 2


def test_kappa_matches_reference(rng):
    m = rng.integers(0, 50, (6, 6)).astype(np.float64)
    np.testing.assert_allclose(kappa(m), _ref_kappa(m), rtol=1e-12)


def test_aa_oa_skips_class0(rng):
    c = 4
    m = rng.integers(1, 30, (c, c)).astype(np.float64)
    aa, oa, k, rows = aa_oa(m)
    col = m.sum(axis=0)
    accs = [m[i, i] / col[i] for i in range(1, c)]
    np.testing.assert_allclose(aa, np.mean(accs), rtol=1e-12)
    np.testing.assert_allclose(
        oa, sum(m[i, i] for i in range(1, c)) / col.sum(), rtol=1e-12)
    np.testing.assert_allclose(k, _ref_kappa(m), rtol=1e-12)
    assert len(rows) == c - 1
    assert rows[0] == [col[1], m[1, 1], m[1, 1] / col[1]]


def test_render_class_map():
    palette = jnp.asarray([[0, 0, 0], [255, 0, 0], [0, 255, 0]])
    labels = jnp.asarray([[0, 1], [2, 1]])
    img = np.asarray(render_class_map(labels, palette))
    assert img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 1], [255, 0, 0])
    np.testing.assert_array_equal(img[1, 0], [0, 255, 0])


def test_workbook_roundtrip(tmp_path):
    wb = Workbook()
    sh = wb.active
    sh.cell(1, 1, "OA")
    sh.cell(1, 2, 0.953)
    sh.cell(2, 1, 42)
    sh.cell(3, 28, "wide <col> & escaped")
    extra = wb.create_sheet("config")
    extra.cell(1, 1, "seed")
    path = tmp_path / "t.xlsx"
    wb.save(path)
    back = Workbook.load(path)
    assert back.active.cell(1, 1) == "OA"
    assert abs(back.active.cell(1, 2) - 0.953) < 1e-12
    assert back.active.cell(2, 1) == 42
    assert back.active.cell(3, 28) == "wide <col> & escaped"
    assert back["config"].cell(1, 1) == "seed"


def test_expo_result_blocks(tmp_path, small_cfg):
    cfg = dict(small_cfg)
    cfg["RESULT_excel"] = str(tmp_path / "r.xlsx")
    result = [0.9, 0.95, 0.88, [[10.0, 9.0, 0.9], [20.0, 19.0, 0.95]]]
    expo_result(result, cfg, [12.5, 3.5], 0)
    expo_result(result, cfg, [13.5, 4.5], 1)
    wb = Workbook.load(cfg["RESULT_excel"])
    sh = wb.active
    # Repeat 0 block at rows 1..6, repeat 1 at rows 9..14 (offset 8).
    assert sh.cell(1, 1) == "Category"
    assert sh.cell(9, 1) == "Category"
    assert abs(sh.cell(6, 3) - 0.95) < 1e-12       # OA
    assert abs(sh.cell(6, 11) - 3.5) < 1e-12       # actual test time (bug fixed)
    assert wb["config"].cell(1, 1) is not None     # config sheet exists
