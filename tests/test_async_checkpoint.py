"""Async (overlapped) orbax checkpointing: save(block=False) returns
after host staging and the write completes on a background thread;
wait_for_checkpoints joins it; is_finalized detects torn writes so
resume logic never restores a torso (scripts/train.py, ablation.py)."""
import json

import jax.numpy as jnp
import numpy as np

from rovit_kan_tpu.utils.checkpoint import (
    is_finalized, load_checkpoint, promote_staging, save_checkpoint,
    wait_for_checkpoints)


def _params(seed=0):
    rng = np.random.RandomState(seed)
    return {"w": jnp.asarray(rng.randn(16, 16).astype(np.float32)),
            "b": jnp.asarray(rng.randn(16).astype(np.float32))}


def test_async_save_roundtrip(tmp_path):
    p = _params()
    save_checkpoint(tmp_path / "ck", p, epoch=3, block=False)
    wait_for_checkpoints()
    assert is_finalized(tmp_path / "ck")
    ck = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(np.asarray(p["w"]), ck["params"]["w"])
    assert ck["epoch"] == 3


def test_async_overwrite_waits_for_inflight_write(tmp_path):
    """Back-to-back saves to the SAME path: the second must join the
    first before rmtree'ing it (else it deletes a directory mid-write)."""
    save_checkpoint(tmp_path / "ck", _params(0), epoch=1, block=False)
    save_checkpoint(tmp_path / "ck", _params(1), epoch=2, block=False)
    wait_for_checkpoints()
    ck = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(
        np.asarray(_params(1)["w"]), ck["params"]["w"])
    assert ck["epoch"] == 2


def test_load_joins_inflight_write(tmp_path):
    """Same-process read-after-async-write: load_checkpoint must see the
    committed data without an explicit wait_for_checkpoints."""
    save_checkpoint(tmp_path / "ck", _params(7), block=False)
    ck = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(
        np.asarray(_params(7)["w"]), ck["params"]["w"])


def test_is_finalized_rejects_non_checkpoints(tmp_path):
    assert not is_finalized(tmp_path / "missing")
    torn = tmp_path / "torn"
    torn.mkdir()                       # exists, but no orbax commit marker
    (torn / "some_array").write_bytes(b"partial")
    assert not is_finalized(torn)


def test_old_checkpoint_survives_async_overwrite_window(tmp_path):
    """Durability: while an async overwrite is pending (before any join),
    the previously committed checkpoint is still the one under the final
    name — a crash in that window loses nothing."""
    save_checkpoint(tmp_path / "ck", _params(0), epoch=1, block=True)
    save_checkpoint(tmp_path / "ck", _params(1), epoch=2, block=False)
    # No join yet: the final name must still be the committed epoch-1
    # checkpoint (the new write targets the ck.next staging dir).
    assert is_finalized(tmp_path / "ck")
    meta = json.loads((tmp_path / "ck.meta.json").read_text())
    assert meta["epoch"] == 1
    wait_for_checkpoints()             # swap happens here
    meta = json.loads((tmp_path / "ck.meta.json").read_text())
    assert meta["epoch"] == 2
    ck = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(
        np.asarray(_params(1)["w"]), ck["params"]["w"])


def test_promote_staging_adopts_committed_orphan(tmp_path):
    """Crash between orbax's commit and the swap leaves a committed
    ck.next and (possibly) no final ck — promote_staging adopts it."""
    import shutil
    save_checkpoint(tmp_path / "ck", _params(3), epoch=5, block=True)
    # Fabricate the crash residue: final gone, committed staging present.
    (tmp_path / "ck").rename(tmp_path / "ck.next")
    (tmp_path / "ck.meta.json").rename(tmp_path / "ck.next.meta.json")
    assert not is_finalized(tmp_path / "ck")
    assert promote_staging(tmp_path / "ck")
    ck = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(
        np.asarray(_params(3)["w"]), ck["params"]["w"])
    assert ck["epoch"] == 5
    # A later committed final must NOT be displaced by a stale staging.
    shutil.copytree(tmp_path / "ck", tmp_path / "ck.next")
    save_checkpoint(tmp_path / "ck", _params(4), epoch=6, block=True)
    assert promote_staging(tmp_path / "ck")
    assert load_checkpoint(tmp_path / "ck")["epoch"] == 6


def test_promote_adopts_newer_stage_over_committed_final(tmp_path):
    """The dominant hard-kill residue of the async protocol: the write
    committed to ck.next but the deferred swap never ran, so BOTH the
    (older) final and the (newer) stage are committed checkpoints.
    Resume must take the stage, not silently roll the best back."""
    save_checkpoint(tmp_path / "ck", _params(0), epoch=3, block=True)
    save_checkpoint(tmp_path / "other", _params(1), epoch=5, block=True)
    (tmp_path / "other").rename(tmp_path / "ck.next")
    (tmp_path / "other.meta.json").rename(tmp_path / "ck.next.meta.json")
    assert is_finalized(tmp_path / "ck")          # old best, committed
    assert is_finalized(tmp_path / "ck.next")     # newer best, committed
    assert promote_staging(tmp_path / "ck")
    ck = load_checkpoint(tmp_path / "ck")
    assert ck["epoch"] == 5
    np.testing.assert_array_equal(
        np.asarray(_params(1)["w"]), ck["params"]["w"])


def test_promote_keeps_final_when_stage_sidecar_is_older(tmp_path):
    """Belt-and-braces epoch guard: a fabricated stage whose sidecar says
    it is OLDER than the committed final is left alone."""
    save_checkpoint(tmp_path / "ck", _params(0), epoch=2, block=True)
    save_checkpoint(tmp_path / "other", _params(1), epoch=7, block=True)
    (tmp_path / "ck").rename(tmp_path / "ck.next")
    (tmp_path / "ck.meta.json").rename(tmp_path / "ck.next.meta.json")
    (tmp_path / "other").rename(tmp_path / "ck")
    (tmp_path / "other.meta.json").rename(tmp_path / "ck.meta.json")
    assert promote_staging(tmp_path / "ck")
    assert load_checkpoint(tmp_path / "ck")["epoch"] == 7


def test_promote_repairs_half_swap(tmp_path):
    """Crash between the swap's data rename and sidecar rename: the final
    name holds the NEW data but the OLD meta, with an orphan stage
    sidecar. promote_staging finishes the sidecar half."""
    save_checkpoint(tmp_path / "ck", _params(5), epoch=5, block=True)
    new_meta = (tmp_path / "ck.meta.json").read_text()
    old = json.loads(new_meta)
    old["epoch"] = 3
    (tmp_path / "ck.meta.json").write_text(json.dumps(old))
    (tmp_path / "ck.next.meta.json").write_text(new_meta)
    assert promote_staging(tmp_path / "ck")
    assert load_checkpoint(tmp_path / "ck")["epoch"] == 5
    assert not (tmp_path / "ck.next.meta.json").exists()


def test_save_reaps_orbax_tmp_torso(tmp_path):
    """A hard crash mid-write leaves an orbax *-tmp-* torso; the next
    save in that directory must reap it (and not crash trying —
    ocp.utils.tmp_checkpoints returns TemporaryPath objects, not names)."""
    torso = tmp_path / "ck.orbax-checkpoint-tmp-999"
    torso.mkdir()
    (torso / "partial").write_bytes(b"x")
    save_checkpoint(tmp_path / "ck", _params(2), epoch=1, block=True)
    assert not torso.exists()
    assert is_finalized(tmp_path / "ck")
