"""Multi-run result collector (reference yml2Excel capability,
indicators/kappa.py:162-213)."""

import os

from dmfusion.report.collect import collect_results, read_run_metrics
from dmfusion.report.excel import Workbook, expo_result


def _fake_run(root, name, repeats):
    run_dir = os.path.join(root, name)
    os.makedirs(run_dir, exist_ok=True)
    xlsx = os.path.join(run_dir, "gmfnet__0_result.xlsx")
    cfg = {"RESULT_excel": xlsx, "model_name": "gmfnet"}
    for rep, (aa, oa, k) in enumerate(repeats):
        result = [aa, oa, k, [(10, 9, 0.9), (5, 4, 0.8)]]
        expo_result(result, cfg, [1.5, 0.5], rep)
    return xlsx


def test_read_run_metrics(tmp_path):
    xlsx = _fake_run(str(tmp_path), "runA", [(0.8, 0.9, 0.85),
                                             (0.82, 0.91, 0.86)])
    metrics = read_run_metrics(xlsx)
    assert [m["repeat"] for m in metrics] == [0, 1]
    assert metrics[0]["oa"] == 0.9 and metrics[1]["kappa"] == 0.86


def test_collect_results(tmp_path):
    _fake_run(str(tmp_path), "city1_tr0.02", [(0.8, 0.9, 0.85)])
    _fake_run(str(tmp_path), "city2_tr0.02", [(0.7, 0.75, 0.7),
                                              (0.72, 0.77, 0.72)])
    out = collect_results(str(tmp_path))
    assert os.path.exists(out)
    wb = Workbook.load(out)
    sheet = wb["summary"]
    assert sheet.cell(1, 1) == "run" and sheet.cell(1, 3) == "OA"
    # First run: one repeat row + mean row.
    assert sheet.cell(2, 2) == 0 and sheet.cell(2, 3) == 0.9
    assert sheet.cell(3, 2) == "mean" and abs(sheet.cell(3, 3) - 0.9) < 1e-9
    # Second run block starts after the blank separator row.
    assert sheet.cell(5, 3) == 0.75 and sheet.cell(6, 3) == 0.77
    mean_oa = sheet.cell(7, 3)
    assert abs(mean_oa - 0.76) < 1e-9
