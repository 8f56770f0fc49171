"""Visualization: offline PNG rendering + live web viewer.

Replaces the reference's Pangolin GL viewer (Viewer/FrameDrawer/MapDrawer,
/root/reference/src/Viewer.cc, FrameDrawer.cc, MapDrawer.cc) with (a) an
offline renderer producing PNGs and (b) a dependency-free live HTTP viewer
(tpuslam.viz.server.LiveViewer) serving an orbiting 3D map view to any
browser — the headless-friendly forms for TPU pods.
"""

from tpuslam.viz.render import draw_frame, render_map_topdown
from tpuslam.viz.server import LiveViewer
