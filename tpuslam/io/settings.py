"""OpenCV-YAML settings files -> camera / ORB / tracker configuration.

Parses the reference's settings schema (the 11 YAMLs under
/root/reference/Examples/, e.g. Examples/Monocular/TUM1.yaml): Camera.{fx,
fy,cx,cy,k1,k2,p1,p2,k3,bf,fps,RGB}, ORBextractor.{nFeatures,scaleFactor,
nLevels,iniThFAST,minThFAST}, ThDepth, DepthMapFactor, and the stereo
LEFT.*/RIGHT.* rectification blocks used by the EuRoC driver
(/root/reference/Examples/Stereo/stereo_euroc.cc:63-100).

OpenCV FileStorage YAML needs two fixes for PyYAML: the '%YAML:1.0'
directive line and the '!!opencv-matrix' tags.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

import numpy as np
import yaml

from tpuslam.geometry.camera import PinholeCamera
from tpuslam.ops.orb import ORBConfig


@dataclasses.dataclass
class Settings:
    cam: PinholeCamera
    orb: ORBConfig
    fps: float = 30.0
    rgb: bool = True
    th_depth_factor: float = 40.0
    depth_map_factor: float = 1.0
    # Optional stereo rectification blocks (EuRoC): K, D, R, P per side.
    left_rect: Optional[dict] = None
    right_rect: Optional[dict] = None


def _parse_opencv_yaml(path: str) -> dict:
    text = open(path).read()
    text = re.sub(r"^%YAML:.*$", "", text, flags=re.M)
    text = text.replace("!!opencv-matrix", "")
    # OpenCV tolerates 'Key:value' without the space (e.g. the reference's
    # 'Viewer.PointSize:2'); strict YAML does not.
    text = re.sub(r"^(\s*[A-Za-z0-9_.]+):(\S)", r"\1: \2", text, flags=re.M)
    return yaml.safe_load(text) or {}


def _matrix(node: dict) -> np.ndarray:
    return np.array(node["data"], dtype=np.float64).reshape(
        int(node["rows"]), int(node["cols"])
    )


def load_settings(path: str, width: int = 640, height: int = 480) -> Settings:
    d = _parse_opencv_yaml(path)

    def g(key, default=0.0):
        return float(d.get(key, default))

    cam = PinholeCamera(
        fx=g("Camera.fx"),
        fy=g("Camera.fy"),
        cx=g("Camera.cx"),
        cy=g("Camera.cy"),
        k1=g("Camera.k1"),
        k2=g("Camera.k2"),
        p1=g("Camera.p1"),
        p2=g("Camera.p2"),
        k3=g("Camera.k3"),
        bf=g("Camera.bf"),
        width=int(d.get("Camera.width", width)),
        height=int(d.get("Camera.height", height)),
    )
    orb = ORBConfig(
        n_features=int(d.get("ORBextractor.nFeatures", 1000)),
        scale_factor=float(d.get("ORBextractor.scaleFactor", 1.2)),
        n_levels=int(d.get("ORBextractor.nLevels", 8)),
        ini_th_fast=float(d.get("ORBextractor.iniThFAST", 20)),
        min_th_fast=float(d.get("ORBextractor.minThFAST", 7)),
    )
    depth_factor = float(d.get("DepthMapFactor", 1.0))
    if depth_factor != 0:
        depth_factor = 1.0 / depth_factor if depth_factor > 1.0 + 1e-6 else depth_factor

    left = right = None
    if "LEFT.K" in d:
        left = {k.split(".")[1]: _matrix(d[k]) for k in ("LEFT.K", "LEFT.D", "LEFT.R", "LEFT.P")}
        right = {
            k.split(".")[1]: _matrix(d[k]) for k in ("RIGHT.K", "RIGHT.D", "RIGHT.R", "RIGHT.P")
        }

    return Settings(
        cam=cam,
        orb=orb,
        fps=float(d.get("Camera.fps", 30.0)),
        rgb=bool(d.get("Camera.RGB", 1)),
        th_depth_factor=float(d.get("ThDepth", 40.0)),
        depth_map_factor=depth_factor,
        left_rect=left,
        right_rect=right,
    )
