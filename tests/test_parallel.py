"""Multi-chip sharding: 8-device virtual CPU mesh dry run."""

import numpy as np
import jax


def test_mesh_shapes():
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "spatial")


def test_sharded_stabilize_matches_single_device():
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel.pipeline import (
        jit_stabilize_step,
        sharded_stabilize,
    )

    rng = np.random.default_rng(0)
    frames = rng.random((16, 32, 64, 3)).astype(np.float32)
    mesh = make_mesh(8)
    warped, masks, offsets = sharded_stabilize(frames, mesh, strength=0.9, window=5)

    import jax.numpy as jnp

    ref = jit_stabilize_step(
        jnp.asarray(frames), jnp.float32(0.9), 5, jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    )
    np.testing.assert_allclose(warped, np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(masks, np.asarray(ref[1]), atol=1e-5)


def test_graft_entry_contract():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__ as GE

    fn, args = GE.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out[0])).all()

    GE.dryrun_multichip(8)
