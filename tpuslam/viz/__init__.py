"""Offline visualization: map / trajectory / frame rendering to images.

Replaces the reference's Pangolin GL viewer (Viewer/FrameDrawer/MapDrawer,
/root/reference/src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc) with an
offline renderer producing PNGs — the headless-friendly form for TPU pods.
"""

from tpuslam.viz.render import draw_frame, render_map_topdown
