"""Trace-time queries about the active ``jax.sharding`` mesh.

The engines run identical code with and without a device mesh (the
TPU analog of the reference's single-process loop,
/root/reference/nodes/video_stabilizer_classic.py:288-290 — SURVEY
2.10 maps its sequence-global reductions onto GSPMD collectives).
Pallas kernels, however, are single-device programs: inside a
GSPMD-partitioned jit they must either be replaced by their XLA
mirrors (estimation kernels — the mirrors partition automatically) or
be explicitly ``shard_map``-ped over the frame axis (the warp, whose
per-frame work is embarrassingly parallel).  These helpers centralize
that trace-time decision; ``jax.jit`` keys its cache on the abstract
mesh, so meshless runs trace mesh-free programs.
"""

from __future__ import annotations

import jax


def active_abstract_mesh():
    """The active abstract mesh under ``jax.sharding.set_mesh``, else None."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh is not None and not mesh.empty:
            return mesh
    except Exception:
        pass
    return None


def mesh_active() -> bool:
    return active_abstract_mesh() is not None


def data_shards(n: int):
    """Number of even frame-axis shards the active mesh provides for an
    ``n``-frame clip, or None (no mesh / no ``data`` axis / uneven).

    Uneven clips fall back to spatial sharding or replication
    (parallel/production.py::input_partition_spec), where the frame
    axis stays whole — per-frame shard_map then does not apply."""
    mesh = active_abstract_mesh()
    if mesh is None or "data" not in mesh.axis_names:
        return None
    nd = int(mesh.shape["data"])
    if nd > 1 and n % nd == 0:
        return nd
    return None
