"""Debug visualization helpers.

Equivalents of the reference's matplotlib sanity-check utilities
(phantomdata/helpers.py:249-281: visualize_volume, visualize_query_points)
— plotting a volume's bounding box corners and a few corner/center rays to
verify camera geometry against the volume. Headless (Agg) and
savefig-based instead of plt.show.
"""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def visualize_volume(grid_bounds, out_path: str, grid_scaling_factor: float = 1.0):
    """Scatter the 8 corners of a volume's bounds (helpers.py:249-265)."""
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")
    xb, yb, zb = grid_bounds[0:2], grid_bounds[2:4], grid_bounds[4:6]
    for x in xb:
        for y in yb:
            for z in zb:
                ax.scatter(
                    x / grid_scaling_factor, y / grid_scaling_factor,
                    z / grid_scaling_factor, color="red",
                )
                ax.scatter(x, y, z, color="grey")
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def visualize_query_points(
    origins,
    directions,
    depth_values,
    img_width: int,
    img_height: int,
    out_path: str,
    grid_bounds=None,
):
    """Plot corner/center/edge rays as 3D segments (helpers.py:267-281) to
    eyeball the camera geometry; optionally overlays the volume bounds."""
    origins = np.asarray(origins)
    directions = np.asarray(directions)
    depth_values = np.asarray(depth_values)

    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.set_xlabel("X")
    ax.set_ylabel("Y")
    ax.set_zlabel("Z")

    xs = [0, img_width // 2 - 1, img_width - 1]
    ys = [0, img_height // 2 - 1, img_height - 1]
    for x in xs:
        for y in ys:
            o = origins[y, x]
            d = directions[y, x]
            p0 = o + d * depth_values[0]
            p1 = o + d * depth_values[-1]
            seg = np.array([p0, p1]).T
            ax.plot(seg[0], seg[1], seg[2], c="grey")

    if grid_bounds is not None:
        xb, yb, zb = grid_bounds[0:2], grid_bounds[2:4], grid_bounds[4:6]
        for x in xb:
            for y in yb:
                for z in zb:
                    ax.scatter(x, y, z, color="red", s=12)

    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
