"""Optional visualization helpers (parity with the reference's
``try_open3d_viz``, ``example/ex01_essential_estimation.py:208-219``)."""

from __future__ import annotations


def try_open3d_viz(ply_file):
    """Open a PLY point cloud in open3d when available; otherwise print
    a hint (same graceful degradation as the reference)."""
    try:
        from open3d import io, visualization as viz

        pc = io.read_point_cloud(ply_file)
        viz.draw_geometries([pc])
    except ImportError:
        print(
            "Failed to import `open3d`; cannot visualize the point cloud. "
            "Install open3d or open the PLY in meshlab."
        )
