"""Host-side rendering of planar-engine models.

The reference records videos straight from MuJoCo's renderer
(icem/misc/rollout_utils.py:70-81, :174-183). Our physics is a pure-JAX
planar engine, so rendering is a host-side matplotlib rasterization of the
kinematic skeleton: ground line, bone segments (parent-origin -> body
origin), contact geoms as circles to scale. Rendering never touches the
device hot path — frames are drawn from numpy copies of episode states.
"""

from __future__ import annotations

import numpy as np


def _fk_host(model, q):
    """Numpy forward kinematics (mirrors physics.planar.fk, host-side)."""
    q = np.asarray(q, np.float64)
    B = model.nbody
    anchors = np.asarray(model.anchor, np.float64)
    origins = np.zeros((B, 2))
    angles = np.zeros(B)
    for b in range(B):
        if b == 0:
            if model.free_root:
                angles[0] = q[2]
                origins[0] = q[0:2] + anchors[0]
            else:
                angles[0] = q[0]
                origins[0] = anchors[0]
        else:
            pa = model.parent[b]
            pang = angles[pa]
            c, s = np.cos(pang), np.sin(pang)
            rot = np.array([[c, -s], [s, c]])
            angles[b] = pang + q[model.dof_of_body(b)]
            origins[b] = origins[pa] + rot @ anchors[b]
    geom_pts = np.zeros((len(model.geom_body), 2))
    for g, b in enumerate(model.geom_body):
        c, s = np.cos(angles[b]), np.sin(angles[b])
        rot = np.array([[c, -s], [s, c]])
        geom_pts[g] = origins[b] + rot @ np.asarray(model.geom_pos[g], np.float64)
    return origins, angles, geom_pts


def _fk_host_spatial(model, q):
    """Numpy forward kinematics (mirrors physics.spatial.fk, host-side)."""
    q = np.asarray(q, np.float64)
    B = model.nbody
    anchors = np.asarray(model.anchor, np.float64)
    axes = np.asarray(model.axis, np.float64)
    origins = np.zeros((B, 3))
    rots = np.zeros((B, 3, 3))

    def rot_axis(a, th):
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    for b in range(B):
        if b == 0:
            if model.free_root:
                r, p, y = q[3], q[4], q[5]
                Rx = rot_axis(np.array([1.0, 0, 0]), r)
                Ry = rot_axis(np.array([0, 1.0, 0]), p)
                Rz = rot_axis(np.array([0, 0, 1.0]), y)
                rots[0] = np.asarray(getattr(model, "root_rot_offset", np.eye(3)),
                                     np.float64) @ (Rz @ Ry @ Rx)
                origins[0] = q[0:3] + anchors[0]
            else:
                rots[0] = rot_axis(axes[0], q[0])
                origins[0] = anchors[0]
        else:
            pa = model.parent[b]
            rots[b] = rots[pa] @ rot_axis(axes[b], q[model.dof_of_body(b)])
            origins[b] = origins[pa] + rots[pa] @ anchors[b]
    geom_pts = np.zeros((len(model.geom_body), 3))
    for g, b in enumerate(model.geom_body):
        geom_pts[g] = origins[b] + rots[b] @ np.asarray(model.geom_pos[g], np.float64)
    return origins, rots, geom_pts


def render_spatial_xz(model, q, *, width: int = 480, height: int = 320,
                      window: float = 3.0) -> np.ndarray:
    """Sagittal (x, z) wireframe of a SpatialModel pose. Returns uint8 [H,W,3]."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    origins, _, geom_pts = _fk_host_spatial(model, q)
    xz = origins[:, [0, 2]]
    cx = float(xz[0, 0])

    fig, ax = plt.subplots(figsize=(width / 100, height / 100), dpi=100)
    try:
        ax.set_xlim(cx - window / 2, cx + window / 2)
        ax.set_ylim(-0.3, -0.3 + window * height / width)
        ax.set_aspect("equal")
        ax.axis("off")
        ax.axhline(0.0, color="#888888", lw=1.5)
        for x_tick in np.arange(np.floor(cx - window), np.ceil(cx + window)):
            ax.plot([x_tick, x_tick], [0.0, -0.08], color="#bbbbbb", lw=1.0)
        for b in range(1, model.nbody):
            pa = model.parent[b]
            ax.plot([xz[pa, 0], xz[b, 0]], [xz[pa, 1], xz[b, 1]],
                    color="#2c6fbb", lw=3.0, solid_capstyle="round")
        ax.plot(xz[0, 0], xz[0, 1], "o", color="#1a3a5c", ms=8)
        for g in range(len(geom_pts)):
            ax.add_patch(plt.Circle((geom_pts[g, 0], geom_pts[g, 2]),
                                    float(model.geom_radius[g]),
                                    fill=False, color="#d95f02", lw=1.5))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        return np.ascontiguousarray(buf)
    finally:
        plt.close(fig)


def render_planar(model, q, *, width: int = 480, height: int = 320,
                  window: float = 3.0) -> np.ndarray:
    """Rasterize one frame of a PlanarModel pose. Returns uint8 [H, W, 3]."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    origins, angles, geom_pts = _fk_host(model, q)
    cx = float(origins[0, 0])

    fig, ax = plt.subplots(figsize=(width / 100, height / 100), dpi=100)
    try:
        ax.set_xlim(cx - window / 2, cx + window / 2)
        ax.set_ylim(-0.3, -0.3 + window * height / width)
        ax.set_aspect("equal")
        ax.axis("off")
        # ground with distance ticks so locomotion progress is visible
        ax.axhline(0.0, color="#888888", lw=1.5)
        for x_tick in np.arange(np.floor(cx - window), np.ceil(cx + window)):
            ax.plot([x_tick, x_tick], [0.0, -0.08], color="#bbbbbb", lw=1.0)

        for b in range(1, model.nbody):
            pa = model.parent[b]
            ax.plot([origins[pa, 0], origins[b, 0]],
                    [origins[pa, 1], origins[b, 1]],
                    color="#2c6fbb", lw=3.0, solid_capstyle="round")
        ax.plot(origins[0, 0], origins[0, 1], "o", color="#1a3a5c", ms=8)
        for g in range(len(geom_pts)):
            ax.add_patch(plt.Circle(geom_pts[g], float(model.geom_radius[g]),
                                    fill=False, color="#d95f02", lw=1.5))
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        return np.ascontiguousarray(buf)
    finally:
        plt.close(fig)
