"""Checkpoint subsystem: msgpack roundtrip and Orbax step-indexed manager."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_state():
    import jax
    import jax.numpy as jnp
    import optax

    from aadff_tpu.models.aifnet import AiFDepthNet
    from aadff_tpu.train.trainer import create_train_state

    model = AiFDepthNet(n_stack=4)
    optimizer = optax.adam(1e-3)
    state = create_train_state(model, optimizer, jnp.zeros((1, 4, 64, 64, 3)),
                               jnp.zeros((1, 4)), jax.random.PRNGKey(0))
    return state


def test_orbax_manager_save_restore(tiny_state, tmp_path):
    import jax

    from aadff_tpu.train.trainer import OrbaxManager, TrainState

    mgr = OrbaxManager(str(tmp_path / "ckpts"), max_to_keep=2)
    mgr.save(1, tiny_state)
    state2 = tiny_state.replace(step=tiny_state.step + 5)
    mgr.save(2, state2)
    restored = mgr.restore(tiny_state)  # latest
    assert int(restored.step) == 5
    a = jax.tree.leaves(tiny_state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # explicit step restore
    r1 = mgr.restore(tiny_state, step=1)
    assert int(r1.step) == 0


def test_msgpack_roundtrip(tiny_state, tmp_path):
    import jax

    from aadff_tpu.train.trainer import load_checkpoint, save_checkpoint

    state2 = tiny_state.replace(step=tiny_state.step + 7)
    save_checkpoint(str(tmp_path), state2, "best")
    restored = load_checkpoint(str(tmp_path), tiny_state, "best")
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_stripped_checkpoint(tiny_state, tmp_path):
    """Committed eval checkpoints drop opt_state (scripts/strip_ckpt.py);
    load_checkpoint must restore them, keeping the fresh opt_state."""
    import subprocess
    import sys

    import jax
    import jax.numpy as jnp

    from aadff_tpu.train.trainer import load_checkpoint, save_checkpoint

    bumped = jax.tree.map(lambda p: p + 1.0, tiny_state.params)
    state2 = tiny_state.replace(params=bumped, step=jnp.asarray(42))
    save_checkpoint(str(tmp_path), state2, "full")
    full = str(tmp_path / "depth_net_full.msgpack")
    stripped = str(tmp_path / "depth_net_stripped.msgpack")
    import os
    script = os.path.join(os.path.dirname(__file__), "..",
                          "scripts", "strip_ckpt.py")
    subprocess.run([sys.executable, script, full, stripped], check=True)
    assert os.path.getsize(stripped) < 0.5 * os.path.getsize(full)

    restored = load_checkpoint(str(tmp_path), tiny_state, "stripped")
    assert int(restored.step) == 42
    for a, b in zip(jax.tree.leaves(bumped), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state comes back from the caller's fresh state: with a constant
    # lr there is no schedule count to re-seed, and Adam's own count stays
    # 0 to match its zeroed moments (r4 advisor finding)
    for a, b in zip(jax.tree.leaves(tiny_state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stripped_resume_keeps_schedule_position(tmp_path):
    """Resuming training from a stripped checkpoint must not restart the
    cosine LR schedule at peak (round-3 advisor finding): the schedule
    `count` is re-seeded from the saved step — but Adam's own count is NOT
    (its moments are zero; a warm count would inflate the first few hundred
    post-resume updates ~3-6x via bias correction, r4 advisor finding)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax.serialization import msgpack_restore, msgpack_serialize

    from aadff_tpu.train.trainer import (TrainState, load_checkpoint,
                                         save_checkpoint)

    opt = optax.adam(optax.cosine_decay_schedule(1e-3, decay_steps=100))
    params = {"w": jnp.ones((3,))}
    g = {"w": jnp.full((3,), 0.1)}
    p, opt_state = params, opt.init(params)
    for _ in range(60):
        u, opt_state = opt.update(g, opt_state, p)
        p = optax.apply_updates(p, u)
    state60 = TrainState(params=p, batch_stats={}, opt_state=opt_state,
                         step=jnp.asarray(60, jnp.int32))
    save_checkpoint(str(tmp_path), state60, "full")
    sd = msgpack_restore((tmp_path / "depth_net_full.msgpack").read_bytes())
    kept = {k: sd[k] for k in ("params", "batch_stats", "step")}
    (tmp_path / "depth_net_stripped.msgpack").write_bytes(
        msgpack_serialize(kept))

    fresh = TrainState(params=params, batch_stats={},
                       opt_state=opt.init(params),
                       step=jnp.asarray(0, jnp.int32))
    restored = load_checkpoint(str(tmp_path), fresh, "stripped")
    adam_r, sched_r = restored.opt_state
    assert type(sched_r).__name__ == "ScaleByScheduleState"
    assert int(sched_r.count) == 60      # LR schedule position kept
    assert int(adam_r.count) == 0        # cold Adam matches zeroed moments
    assert all(float(np.max(np.abs(m))) == 0.0
               for m in jax.tree.leaves((adam_r.mu, adam_r.nu)))
    # a full-state resume still restores counts AND moments exactly
    full = load_checkpoint(str(tmp_path), fresh, "full")
    for a, b in zip(jax.tree.leaves(state60.opt_state),
                    jax.tree.leaves(full.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_retention(tiny_state, tmp_path):
    from aadff_tpu.train.trainer import OrbaxManager

    mgr = OrbaxManager(str(tmp_path / "ck2"), max_to_keep=2)
    for s in [1, 2, 3]:
        mgr.save(s, tiny_state)
    steps = sorted(mgr.mgr.all_steps())
    assert steps == [2, 3]
