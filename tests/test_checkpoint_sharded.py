"""Pod-scale (orbax) checkpointing: per-shard save/restore on the 8-device
mesh, async commit fencing, and bit-identical train.py resume through the
orbax format (VERDICT r3 task #8; the reference's single .pth through one
host — reference train.py:397-423 — has the single-host limitation this
path removes).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from k_diffusion_tpu import checkpoint, parallel

from test_infra import _tiny_state


def _fsdp_shard(state, mesh):
    """Shard every leaf with a divisible leading dim over the data axis
    (FSDP-style), replicate the rest — sharded state a pod would hold."""
    n = mesh.shape[parallel.DATA_AXIS]

    def shard(x):
        x = jnp.asarray(x)
        spec = (P(parallel.DATA_AXIS)
                if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0
                else P())
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(shard, state)


def test_sharded_roundtrip_preserves_bits_and_shardings(tmp_path):
    cfg, model, opt, state = _tiny_state()
    mesh = parallel.make_mesh()
    sharded = _fsdp_shard(state, mesh)
    assert any(len(x.sharding.device_set) == 8 and not x.sharding.is_fully_replicated
               for x in jax.tree_util.tree_leaves(sharded))

    host = {"step": 7, "config": cfg, "ema_stats": {"loss": 0.5}, "epoch": 2}
    path = checkpoint.save_checkpoint_sharded(tmp_path / "ck.orbax", sharded, host)
    checkpoint.wait_for_checkpoints()

    # dispatch through the generic loader (directory -> orbax)
    state2, host2 = checkpoint.load_checkpoint(path, sharded)
    assert host2["step"] == 7 and host2["epoch"] == 2
    assert host2["ema_stats"]["loss"] == 0.5

    leaves1 = jax.tree_util.tree_leaves(sharded)
    leaves2 = jax.tree_util.tree_leaves(state2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # each shard restored to its device per the template's sharding
        assert b.sharding == a.sharding, (a.sharding, b.sharding)


def test_sharded_save_is_async_and_fencable(tmp_path):
    _, _, _, state = _tiny_state()
    mesh = parallel.make_mesh()
    sharded = _fsdp_shard(state, mesh)
    # two back-to-back saves: the second must fence the first (one in-flight
    # save at a time), and both must commit by wait_for_checkpoints()
    p1 = checkpoint.save_checkpoint_sharded(tmp_path / "a.orbax", sharded, {"step": 1})
    p2 = checkpoint.save_checkpoint_sharded(tmp_path / "b.orbax", sharded, {"step": 2})
    checkpoint.wait_for_checkpoints()
    for p, step in ((p1, 1), (p2, 2)):
        s, h = checkpoint.load_checkpoint_sharded(p, sharded)
        assert h["step"] == step
        np.testing.assert_array_equal(np.asarray(s.step), np.asarray(sharded.step))


def test_state_json_pointer_deferred_until_commit(tmp_path):
    """The {name}_state.json pointer must keep referencing the last good
    checkpoint until the in-flight async save commits — a crash mid-save
    must leave auto-resume working (advisor r4; the reference never has the
    window because its save is synchronous, reference train.py:419-421)."""
    _, _, _, state = _tiny_state()
    mesh = parallel.make_mesh()
    sharded = _fsdp_shard(state, mesh)
    name = tmp_path / "run"

    p0 = checkpoint.save_checkpoint_sharded(tmp_path / "a.orbax", sharded, {"step": 1})
    checkpoint.wait_for_checkpoints()
    checkpoint.write_state_json(name, p0)

    p1 = checkpoint.save_checkpoint_sharded(tmp_path / "b.orbax", sharded, {"step": 2})
    checkpoint.write_state_json_after_commit(name, p1)
    # deferred: still points at the last known-good checkpoint even though
    # the new save is dispatched (and possibly already committed)
    assert checkpoint.latest_checkpoint(name) == str(p0)

    # the next save's fence commits b and flushes its pointer first
    p2 = checkpoint.save_checkpoint_sharded(tmp_path / "c.orbax", sharded, {"step": 3})
    assert checkpoint.latest_checkpoint(name) == str(p1)
    checkpoint.write_state_json_after_commit(name, p2)

    checkpoint.wait_for_checkpoints()
    assert checkpoint.latest_checkpoint(name) == str(p2)
    s, h = checkpoint.load_checkpoint_sharded(
        checkpoint.latest_checkpoint(name), sharded)
    assert h["step"] == 3


def test_train_cli_orbax_resume_bit_identical(tmp_path, monkeypatch):
    """Straight 4-step run vs 2-step run + orbax resume to step 4: the
    step-4 checkpoints must be bit-identical (same params, opt state, EMA,
    data order)."""
    import train as train_cli

    def run(name, extra):
        argv = ["train.py", "--config", "configs/config_test_tiny.json",
                "--batch-size", "16", "--demo-every", "1000",
                "--evaluate-every", "0", "--sample-n", "4",
                "--num-workers", "1", "--seed", "42",
                "--checkpoint-format", "orbax",
                "--save-every", "2", "--name", str(tmp_path / name)] + extra
        monkeypatch.setattr(sys, "argv", argv)
        train_cli.main()

    run("straight", ["--end-step", "4"])
    run("resumed", ["--end-step", "2"])
    run("resumed", ["--end-step", "4"])  # picks up its own latest (step 2)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    a = ckptr.restore(tmp_path / "straight_00000004.orbax")
    b = ckptr.restore(tmp_path / "resumed_00000004.orbax")
    ckptr.close()
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves_with_path(b)
    assert len(flat_a) == len(flat_b) > 0
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(va, vb, err_msg=str(ka))
