"""BaseSolver: scene residency, splits, repeat-loop skeleton.

Covers reference solver/basesolver.py:9-141: scene load + normalize +
pad, label materialization, labeled/unlabeled split, per-repeat
train/test/valid re-split, checkpoint bookkeeping hooks and the
``indicator`` reporting step.  Differences by design:

  * the "dataloader" produces device-resident id/label arrays batched to
    static shapes, not torch DataLoaders;
  * splits come from a seeded ``numpy`` permutation (seed = cfg seed +
    repeat index).  Torch's ``random_split`` stream cannot be reproduced
    in jax, so split parity is distribution-level (SURVEY.md §7 "RNG
    parity"); the explicit-mask path (``data_new``) gives exact splits;
  * resume is actually wired: the repeat loop can restart from the saved
    epoch/records (the reference scaffolds this but never calls it,
    basesolver.py:107-119).
"""

from __future__ import annotations

import os
import time
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from dmfusion.config import prepare_run
from dmfusion.data.patches import batched_ids_np
from dmfusion.data.scene import (Scene, load_scene, split_labels,
                                 split_labels_masked)
from dmfusion.ops.metrics import aa_oa
from dmfusion.parallel.mesh import get_mesh
from dmfusion.report.excel import expo_result


class Split:
    """Per-repeat index sets (flat row-major pixel ids + labels)."""

    def __init__(self, train: np.ndarray, test: np.ndarray,
                 valid: np.ndarray, labeled: np.ndarray,
                 unlabeled: np.ndarray):
        self.train = train
        self.test = test
        self.valid = valid
        self.labeled = labeled
        self.unlabeled = unlabeled


class BaseSolver:
    def __init__(self, cfg: Mapping[str, Any]):
        cfg = dict(cfg)
        if "RESULT_output" not in cfg:
            cfg = prepare_run(cfg)
        self.cfg = cfg
        self.TIME = cfg["time"]
        self.time = cfg["index"]
        self.EPOCH = cfg["epoch"]
        self.epoch = 0
        self.num_classes = cfg["Categories_Number"]

        self.scene: Scene = load_scene(cfg)
        self.labels_flat = self.scene.label.reshape(-1).astype(np.int32)
        self.labeled_ids, self.unlabeled_ids = split_labels(self.scene.label)
        if not cfg.get("nohup"):
            # Dataset statistics print at scene load (reference
            # data_show, function/function.py:127-133).
            from dmfusion.utils import data_show
            data_show(self.scene.label)

        self.masked_split = None
        if cfg.get("data_new"):
            train_mask = np.load(os.path.join(cfg["data_address"], "train.npy"))
            test_mask = np.load(os.path.join(cfg["data_address"], "test.npy"))
            self.masked_split = split_labels_masked(train_mask, test_mask)

        try:
            self.mesh = get_mesh(cfg)
        except Exception:
            self.mesh = None
        if self.mesh is not None and self.mesh.size == 1:
            self.mesh = None  # single device: skip sharding constraints

        self.split: Split | None = None
        self.records: dict[str, list] = {"Epoch": [], "Loss": [],
                                         "ValLoss": []}
        self.train_time = 0.0
        self.test_time = 0.0
        self.test_matrix: np.ndarray | None = None

    # -- splits ------------------------------------------------------------
    def dataloader(self) -> None:
        """Re-split for the current repeat (reference BaseSolver.dataloader,
        basesolver.py:63-105): labeled pixels -> train/test/valid by
        train_rate/verify_rate, in the reference's [train, test, valid]
        partition order over one permutation."""
        cfg = self.cfg
        # Fresh per-repeat records: the {time}_records.json written at the
        # end of train() must hold only this repeat's curves.
        self.records = {"Epoch": [], "Loss": [], "ValLoss": []}
        rng = np.random.default_rng(int(cfg["seed"]) + int(self.time))
        if self.masked_split is not None:
            _, train_ids, test_pool = self.masked_split
            perm = rng.permutation(test_pool)
            valid_size = int(cfg["verify_rate"] * len(test_pool))
            # Reference order: random_split(test, [test_size, valid_size]).
            test_ids = perm[: len(test_pool) - valid_size]
            valid_ids = perm[len(test_pool) - valid_size:]
            train_ids = rng.permutation(train_ids)
        else:
            n = len(self.labeled_ids)
            perm = rng.permutation(self.labeled_ids)
            train_size = int(cfg["train_rate"] * n)
            valid_size = int(cfg["verify_rate"] * n)
            train_ids = perm[:train_size]
            test_ids = perm[train_size: n - valid_size]
            valid_ids = perm[n - valid_size:]
        self.split = Split(train_ids.astype(np.int32),
                           test_ids.astype(np.int32),
                           valid_ids.astype(np.int32),
                           self.labeled_ids, self.unlabeled_ids)
        self._epoch_rng = rng
        if cfg.get("use_h5") and self.scene.ms is not None:
            # Honor the knob the reference defines but rejects
            # (basesolver.py:45-46 raises): materialize this repeat's
            # train patches as an HDF5 cache — the working version of
            # the reference's offline dataset_cut/save_h5 path
            # (function/function.py:46-90).  The dual-scene guard covers
            # the two-stage solver, which frees the dual scene at
            # stage-2 setup (the reference cache format is dual-only).
            from dmfusion.utils.h5cache import save_patches
            os.makedirs(cfg["RESULT_output"], exist_ok=True)
            path = os.path.join(cfg["RESULT_output"],
                                f"{self.time}_train_patches.h5")
            if not os.path.exists(path):
                save_patches(path, self.scene, self.split.train)

    def batches(self, ids: np.ndarray, batch: int, shuffle: bool = False,
                trim: bool = False, round_to: int = 1):
        """-> (ids (steps,B), labels (steps,B), mask (steps,B), n).

        ``round_to`` rounds the batch size up (eval/predict only — the
        mask keeps metrics exact) so e.g. the reference's batch 300 still
        hits the Pallas gather's 64-multiple fast path.
        """
        if round_to > 1:
            batch = -(-batch // round_to) * round_to
        ids = np.asarray(ids)
        if shuffle:
            ids = self._epoch_rng.permutation(ids)
        if trim and len(ids) >= batch:
            ids = ids[: (len(ids) // batch) * batch]
        # Everything host-side until ONE push per array: on the tunneled
        # TPU each eager device op / fetch is a ~30 ms round trip and
        # this runs every epoch.
        chunks_np, mask_np, n = batched_ids_np(ids, batch)
        labels_np = self.labels_flat[chunks_np.reshape(-1)].reshape(
            chunks_np.shape)
        import jax
        if self.mesh is not None and jax.process_count() > 1:
            # Multi-host: assemble proper global arrays — each process
            # computed the identical host-side batches (seeded split),
            # and contributes the shards its devices own (SURVEY §2.3 DP
            # row; a bare jnp.asarray is not a valid global array under
            # multi-process).
            from dmfusion.parallel.mesh import make_global_batches
            ids_d, labels_d, mask_d = make_global_batches(
                self.mesh, chunks_np, labels_np, mask_np)
            return ids_d, labels_d, mask_d, n
        return (jnp.asarray(chunks_np), jnp.asarray(labels_np),
                jnp.asarray(mask_np), n)

    # -- reporting ---------------------------------------------------------
    def indicator(self) -> None:
        """Save the confusion matrix and export OA/AA/kappa + per-class
        accuracy to the run workbook (reference basesolver.py:121-126)."""
        cfg = self.cfg
        if cfg["test"].get("save_matrix"):
            os.makedirs(cfg["RESULT_output"], exist_ok=True)
            np.save(os.path.join(cfg["RESULT_output"],
                                 f"{self.time}_matrix.npy"), self.test_matrix)
        result = aa_oa(self.test_matrix)
        expo_result(result, cfg, [self.train_time, self.test_time], self.time)
        self.last_result = result

    # -- paths -------------------------------------------------------------
    def best_weights_path(self) -> str:
        return os.path.join(self.cfg["RESULT_output"],
                            f"{self.time}_weights.msgpack")

    def cur_weights_path(self) -> str:
        return os.path.join(self.cfg["RESULT_output"],
                            f"{self.time}_curweights.msgpack")

    # -- overridables ------------------------------------------------------
    def train(self):
        raise NotImplementedError

    def test(self):
        raise NotImplementedError

    def color(self):
        raise NotImplementedError

    def proof(self):
        raise NotImplementedError

    def visualize(self):
        raise NotImplementedError

    def run(self):
        """Repeat loop (reference mainsolver.py:203-209)."""
        while self.time < self.TIME:
            self.dataloader()
            if self.cfg["train"]["index"]:
                self.train()
            if self.cfg["test"]["index"]:
                self.test()
            if self.cfg["color"]["index"]:
                self.color()
            if self.cfg.get("proof", {}).get("index"):
                self.proof()
            if self.cfg.get("visualize", {}).get("index"):
                self.visualize()
            self.time += 1

    def save_records(self) -> None:
        """Persist per-epoch training records as JSON next to the
        checkpoints (the reference carries a ``records`` dict it never
        writes, basesolver.py:61,115-119)."""
        import json
        os.makedirs(self.cfg["RESULT_output"], exist_ok=True)
        path = os.path.join(self.cfg["RESULT_output"],
                            f"{self.time}_records.json")
        with open(path, "w") as f:
            json.dump(self.records, f)

    def load_records(self) -> None:
        """Reload a prior process's per-epoch records on resume, trimmed
        to epochs below the resume point.  Without this a resumed run
        (e.g. a test-only re-invocation after a crash in the test phase)
        re-saves its freshly-initialized empty curves at the end of its
        zero-epoch training loop, clobbering the interrupted run's
        records.json (observed at the image9 two-stage run, r4)."""
        import json
        path = os.path.join(self.cfg["RESULT_output"],
                            f"{self.time}_records.json")
        if not os.path.exists(path):
            return
        try:
            with open(path) as f:
                loaded = json.load(f)
        except (OSError, ValueError):
            return
        if not isinstance(loaded, dict) or not isinstance(
                loaded.get("Epoch"), list):
            return
        keep = [i for i, e in enumerate(loaded["Epoch"])
                if isinstance(e, int) and e < self.epoch]
        self.records = {
            k: [v[i] for i in keep if i < len(v)]
            for k, v in loaded.items() if isinstance(v, list)}
        for k in ("Epoch", "Loss", "ValLoss"):
            self.records.setdefault(k, [])

    # -- profiling ---------------------------------------------------------
    def profile_start(self, tag: str) -> None:
        """Begin a jax.profiler trace when ``profile.enabled`` is set —
        the TPU-native upgrade of the reference's wall-clock-only
        instrumentation (mainsolver.py:41,86-87)."""
        prof = self.cfg.get("profile", {})
        if prof.get("enabled"):
            import jax
            trace_dir = os.path.join(prof.get("dir", "profile/"),
                                     f"{tag}_{self.time}")
            os.makedirs(trace_dir, exist_ok=True)
            jax.profiler.start_trace(trace_dir)
            self._tracing = True

    def profile_stop(self) -> None:
        if getattr(self, "_tracing", False):
            import jax
            jax.profiler.stop_trace()
            self._tracing = False

    @staticmethod
    def now() -> float:
        return time.time()
