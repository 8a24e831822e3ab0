"""Checkpoint save/load incl. the reference's non-strict-load spirit
(utils/utils.py:91-111: strict=False tolerates key drift)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dmfusion.train.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros((3,))},
            "epoch": 7}
    path = tmp_path / "ck.msgpack"
    save_checkpoint(path, tree)
    like = {"params": {"w": jnp.zeros((2, 3)), "b": jnp.ones((3,))},
            "epoch": 0}
    out = load_checkpoint(path, like)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(out["epoch"]) == 7


def test_lenient_load_missing_key(tmp_path):
    save_checkpoint(tmp_path / "ck", {"a": jnp.ones((2,))})
    template = {"a": jnp.zeros((2,)), "extra": jnp.full((3,), 5.0)}
    out = load_checkpoint(tmp_path / "ck", template)
    np.testing.assert_array_equal(np.asarray(out["a"]), [1, 1])
    np.testing.assert_array_equal(np.asarray(out["extra"]), [5, 5, 5])


def test_lenient_load_shape_mismatch(tmp_path):
    save_checkpoint(tmp_path / "ck", {"w": jnp.ones((4, 4))})
    template = {"w": jnp.zeros((2, 2))}
    out = load_checkpoint(tmp_path / "ck", template)
    # Mis-shaped leaf is kept from the template (non-strict survival).
    assert np.asarray(out["w"]).shape == (2, 2)


def test_strict_load_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path / "ck", {"a": jnp.ones((2,))})
    with pytest.raises(Exception):
        load_checkpoint(tmp_path / "ck", {"b": jnp.zeros((2,))}, strict=True)


def test_lenient_load_warns_on_unmatched_leaves(tmp_path):
    """A checkpoint from an older param-tree layout restores leniently
    but LOUDLY: the unmatched/mis-shaped leaves are named in a warning
    (ADVICE r2 — silent reinit used to collapse accuracy on resume)."""
    import warnings
    import numpy as np
    from dmfusion.train.checkpoint import load_checkpoint, save_checkpoint
    old = {"a": np.ones((2, 2), np.float32),
           "head": {"w": np.ones((3,), np.float32)}}
    path = tmp_path / "old.msgpack"
    save_checkpoint(path, old)
    template = {"a": np.zeros((2, 2), np.float32),
                "head": {"w": np.zeros((4,), np.float32),   # shape drift
                         "gain": np.zeros((3,), np.float32)},  # new leaf
                "alpha": np.zeros((), np.float32)}          # new leaf
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = load_checkpoint(path, template)
    msgs = [str(w.message) for w in rec]
    assert any("head/w" in m and "head/gain" in m and "alpha" in m
               for m in msgs), msgs
    np.testing.assert_array_equal(out["a"], old["a"])      # matched: loaded
    np.testing.assert_array_equal(out["head"]["w"], template["head"]["w"])


def test_async_writer_donation_safe(tmp_path):
    """AsyncCheckpointWriter(copy=True) snapshots on-device BEFORE the
    worker fetches: deleting the caller's buffers right after save()
    (what the next epoch's donation does) must not corrupt the write."""
    import jax.numpy as jnp
    from dmfusion.train.checkpoint import AsyncCheckpointWriter
    w = jnp.arange(12.0).reshape(3, 4)
    tree = {"params": {"w": w}, "epoch": 3}
    path = tmp_path / "async.msgpack"
    writer = AsyncCheckpointWriter()
    writer.save(path, tree, copy=True)
    w.delete()                      # simulate donation of the source
    writer.close()
    out = load_checkpoint(path, {"params": {"w": jnp.zeros((3, 4))},
                                 "epoch": 0})
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.arange(12.0).reshape(3, 4))
    assert int(out["epoch"]) == 3


def test_async_writer_last_write_wins(tmp_path):
    """Repeated saves to one path are ordered: after flush the file holds
    the newest tree (at most one in flight per path)."""
    import jax.numpy as jnp
    from dmfusion.train.checkpoint import AsyncCheckpointWriter
    path = tmp_path / "cur.msgpack"
    writer = AsyncCheckpointWriter()
    for epoch in range(4):
        writer.save(path, {"w": jnp.full((2,), float(epoch)),
                           "epoch": epoch}, copy=True)
    writer.close()
    out = load_checkpoint(path, {"w": jnp.zeros((2,)), "epoch": -1})
    assert int(out["epoch"]) == 3
    np.testing.assert_array_equal(np.asarray(out["w"]), [3.0, 3.0])


def test_async_writer_error_surfaces_on_flush(tmp_path):
    """A worker-side write failure is re-raised to the caller at flush
    time, not swallowed on the background thread."""
    import jax.numpy as jnp
    from dmfusion.train.checkpoint import AsyncCheckpointWriter
    blocker = tmp_path / "file"
    blocker.write_text("not a dir")
    writer = AsyncCheckpointWriter()
    writer.save(blocker / "ck.msgpack", {"w": jnp.zeros((2,))}, copy=False)
    with pytest.raises(OSError):
        writer.flush()
    writer.close()


def test_save_checkpoint_is_atomic(tmp_path):
    """Writes go through tmp+rename: the destination never holds a
    partial file, and no tmp litter survives a successful save."""
    import os
    tree = {"w": jnp.ones((4,))}
    path = tmp_path / "ck.msgpack"
    save_checkpoint(path, tree)
    save_checkpoint(path, {"w": jnp.full((4,), 2.0)})  # overwrite in place
    out = load_checkpoint(path, {"w": jnp.zeros((4,))})
    np.testing.assert_array_equal(np.asarray(out["w"]), [2.0] * 4)
    assert [p for p in os.listdir(tmp_path) if ".tmp" in p] == []


def test_matching_load_is_silent(tmp_path):
    import warnings
    import numpy as np
    from dmfusion.train.checkpoint import load_checkpoint, save_checkpoint
    tree = {"a": np.ones((2, 2), np.float32)}
    path = tmp_path / "ok.msgpack"
    save_checkpoint(path, tree)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        load_checkpoint(path, {"a": np.zeros((2, 2), np.float32)})
    assert not [w for w in rec if "freshly-initialized" in str(w.message)]


def test_meta_stamp_roundtrip_and_mismatch(tmp_path):
    """Checkpoints carry a format/identity stamp (VERDICT r3 weak #5):
    a file written by a different model/width refuses to load unless
    lenient; matching stamps load normally."""
    path = tmp_path / "stamped.msgpack"
    save_checkpoint(path, {"w": jnp.ones((2,))},
                    meta={"model": "gmfnet", "width": 64})
    out = load_checkpoint(path, {"w": jnp.zeros((2,))},
                          expect={"model": "gmfnet", "width": 64})
    np.testing.assert_array_equal(np.asarray(out["w"]), [1, 1])
    with pytest.raises(ValueError, match="different configuration"):
        load_checkpoint(path, {"w": jnp.zeros((2,))},
                        expect={"model": "dense_fusion", "width": 64})
    with pytest.raises(ValueError, match="width"):
        load_checkpoint(path, {"w": jnp.zeros((2,))},
                        expect={"model": "gmfnet", "width": 32})
    # train.pretrained_lenient semantics: warn + load what matches.
    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = load_checkpoint(path, {"w": jnp.zeros((2,))},
                              expect={"model": "dense_fusion"},
                              lenient=True)
    assert any("mismatched checkpoint" in str(w.message) for w in rec)
    np.testing.assert_array_equal(np.asarray(out["w"]), [1, 1])


def test_legacy_unstamped_file_still_loads(tmp_path):
    """Pre-stamp checkpoints (bare state-dict layout) load unchanged —
    expect-checks only apply to fields the file actually carries."""
    import os
    from flax import serialization
    path = tmp_path / "legacy.msgpack"
    os.makedirs(tmp_path, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes({"w": np.full((3,), 7.0,
                                                     np.float32)}))
    out = load_checkpoint(path, {"w": jnp.zeros((3,))},
                          expect={"model": "gmfnet", "width": 64})
    np.testing.assert_array_equal(np.asarray(out["w"]), [7.0] * 3)


def test_stamp_checks_only_present_fields(tmp_path):
    """A stamp without some expected field (older writer) is not a
    mismatch for that field."""
    path = tmp_path / "partial.msgpack"
    save_checkpoint(path, {"w": jnp.ones((2,))}, meta={"model": "gmfnet"})
    out = load_checkpoint(path, {"w": jnp.zeros((2,))},
                          expect={"model": "gmfnet", "width": 64})
    np.testing.assert_array_equal(np.asarray(out["w"]), [1, 1])
