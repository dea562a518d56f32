"""Configuration loading: YAML settings with the reference's parameter names.

Equivalent of the reference's cv::FileStorage YAML parsing in the Tracking
constructor (SURVEY.md §5 config row): Camera.fx/fy/cx/cy, distortion,
DepthMapFactor, ThDepth, ORBextractor.* and SP-SLAM's plane thresholds map
1:1 onto SystemConfig fields.
"""

from __future__ import annotations

import re
from dataclasses import replace

from .geometry.camera import Intrinsics
from .mapping.plane_mapper import PlaneMapperConfig
from .tracking.tracker import TrackerConfig


def load_settings(path: str) -> dict:
    """Parse a flat `Key.Sub: value` YAML (cv::FileStorage subset; no
    external yaml dependency needed)."""
    vals: dict[str, float] = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            m = re.match(r"([\w.]+)\s*:\s*([-+\d.eE]+)\s*$", line)
            if m:
                v = float(m.group(2))
                vals[m.group(1)] = v
    return vals


def system_config_from_yaml(path: str, **overrides):
    """Build a SystemConfig from a reference-style YAML settings file."""
    from .system import SystemConfig

    v = load_settings(path)
    intr = Intrinsics(
        fx=v.get("Camera.fx", 525.0),
        fy=v.get("Camera.fy", 525.0),
        cx=v.get("Camera.cx", 319.5),
        cy=v.get("Camera.cy", 239.5),
        k1=v.get("Camera.k1", 0.0),
        k2=v.get("Camera.k2", 0.0),
        p1=v.get("Camera.p1", 0.0),
        p2=v.get("Camera.p2", 0.0),
        k3=v.get("Camera.k3", 0.0),
        bf=v.get("Camera.bf", 40.0),
        width=int(v.get("Camera.width", 640)),
        height=int(v.get("Camera.height", 480)),
    )
    tracker = TrackerConfig(
        n_features=int(v.get("ORBextractor.nFeatures", 1024)),
        n_levels=int(v.get("ORBextractor.nLevels", 8)),
        scale_factor=v.get("ORBextractor.scaleFactor", 1.2),
        th_fast_high=v.get("ORBextractor.iniThFAST", 20.0),
        th_fast_low=v.get("ORBextractor.minThFAST", 7.0),
        th_depth=v.get("ThDepth", 3.2),
    )
    cfg = SystemConfig(intr=intr, tracker=tracker, **overrides)
    if "Plane.AngleThreshold" in v or "Plane.DistanceThreshold" in v:
        cfg.plane_cfg = PlaneMapperConfig(
            assoc_angle_deg=v.get("Plane.AngleThreshold", 8.0),
            assoc_dist=v.get("Plane.DistanceThreshold", 0.15),
        )
    cfg.depth_map_factor = v.get("DepthMapFactor", 5000.0)
    return cfg
