"""Camera calibration models and undistortion remapping.

Replaces pi3/utils/camera.py + pi3/utils/undistortion.py (PyTheia camera
models + a per-pixel Python double loop) with vectorized numpy remap-table
generation over the same four models:

  * PINHOLE (radial k1, k2)
  * PINHOLE_RADIAL_TANGENTIAL (k1, k2, k3 + tangential t1, t2 — OpenCV form)
  * DIVISION_UNDISTORTION (single-parameter division model)
  * FISHEYE (equidistant, k1..k4)

Calibration JSON schema matches example/euroc_cam0_calib.json /
example/cam_calib.json. The undistorted twin camera keeps the original
principal point and unit aspect ratio — the reference intends to center the
principal point but writes to a misspelled key ("principal_point_x" vs the
schema's "principal_pt_x", pi3/utils/undistortion.py:85-86), so the
*effective* behavior it ships (and that its published results used) keeps the
original pp; we reproduce that effective behavior.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


@dataclasses.dataclass
class CalibratedCamera:
    model: str
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    skew: float = 0.0
    radial: Tuple[float, ...] = ()
    tangential: Tuple[float, float] = (0.0, 0.0)

    @classmethod
    def from_json(cls, data: dict, scale: float = 1.0) -> "CalibratedCamera":
        intr = data["intrinsics"]
        f = intr["focal_length"] * scale
        model = data["intrinsic_type"]
        radial: Tuple[float, ...] = ()
        tangential = (0.0, 0.0)
        if model == "DIVISION_UNDISTORTION":
            radial = (intr.get("div_undist_distortion", 0.0),)
        elif model == "FISHEYE":
            radial = tuple(intr.get(f"radial_distortion_{i}", 0.0) for i in (1, 2, 3, 4))
        elif model == "PINHOLE":
            radial = tuple(intr.get(f"radial_distortion_{i}", 0.0) for i in (1, 2))
        elif model == "PINHOLE_RADIAL_TANGENTIAL":
            radial = tuple(intr.get(f"radial_distortion_{i}", 0.0) for i in (1, 2, 3))
            tangential = (
                intr.get("tangential_distortion_1", 0.0),
                intr.get("tangential_distortion_2", 0.0),
            )
        else:
            raise ValueError(f"unsupported intrinsic_type: {model}")
        return cls(
            model=model,
            width=int(data["image_width"] * scale),
            height=int(data["image_height"] * scale),
            fx=f,
            fy=f * intr.get("aspect_ratio", 1.0),
            cx=intr["principal_pt_x"] * scale,
            cy=intr["principal_pt_y"] * scale,
            skew=intr.get("skew", 0.0),
            radial=radial,
            tangential=tangential,
        )

    @classmethod
    def from_file(cls, path: str, scale: float = 1.0) -> "CalibratedCamera":
        with open(path) as f:
            return cls.from_json(json.load(f), scale)

    def intrinsics_matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, self.skew, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )

    def undistorted_twin(self) -> "CalibratedCamera":
        """Zero-distortion twin: same focal & principal point, aspect 1
        (the reference's effective behavior — see module docstring)."""
        return CalibratedCamera(
            model="PINHOLE",
            width=self.width,
            height=self.height,
            fx=self.fx,
            fy=self.fx,  # aspect ratio forced to 1
            cx=self.cx,
            cy=self.cy,
            skew=0.0,
            radial=(0.0, 0.0),
        )

    # --- distortion: normalized camera coords (x, y) -> distorted (xd, yd) ---
    def distort(self, x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        if self.model == "PINHOLE":
            k1, k2 = (self.radial + (0.0, 0.0))[:2]
            r2 = x * x + y * y
            d = 1.0 + r2 * (k1 + k2 * r2)
            return x * d, y * d
        if self.model == "PINHOLE_RADIAL_TANGENTIAL":
            k1, k2, k3 = (self.radial + (0.0,) * 3)[:3]
            t1, t2 = self.tangential
            r2 = x * x + y * y
            d = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            xd = x * d + 2 * t1 * x * y + t2 * (r2 + 2 * x * x)
            yd = y * d + t1 * (r2 + 2 * y * y) + 2 * t2 * x * y
            return xd, yd
        if self.model == "DIVISION_UNDISTORTION":
            # undistortion: xu = xd / (1 + lam rd^2). Distortion inverts it:
            # rd = (1 - sqrt(1 - 4 lam ru^2)) / (2 lam ru)   (Theia's branch)
            lam = self.radial[0] if self.radial else 0.0
            ru = np.sqrt(x * x + y * y)
            if lam == 0.0:
                return x, y
            disc = np.maximum(1.0 - 4.0 * lam * ru * ru, 0.0)
            denom = 2.0 * lam * np.where(ru == 0, 1.0, ru)
            rd = np.where(ru == 0, 0.0, (1.0 - np.sqrt(disc)) / denom)
            scale = np.where(ru == 0, 1.0, rd / np.where(ru == 0, 1.0, ru))
            return x * scale, y * scale
        if self.model == "FISHEYE":
            k1, k2, k3, k4 = (self.radial + (0.0,) * 4)[:4]
            r = np.sqrt(x * x + y * y)
            theta = np.arctan(r)
            t2 = theta * theta
            theta_d = theta * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
            scale = np.where(r == 0, 1.0, theta_d / np.where(r == 0, 1.0, r))
            return x * scale, y * scale
        raise ValueError(self.model)

    def camera_to_image(self, x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        xd, yd = self.distort(x, y)
        u = self.fx * xd + self.skew * yd + self.cx
        v = self.fy * yd + self.cy
        return u, v

    def image_to_camera_pinhole(self, u: np.ndarray, v: np.ndarray):
        """Inverse K only (no distortion removal) — used on the undistorted twin."""
        y = (v - self.cy) / self.fy
        x = (u - self.cx - self.skew * y) / self.fx
        return x, y


class Undistorter:
    """Precomputed remap tables + cv2.remap application
    (UndistortionMaps equivalent, pi3/utils/undistortion.py:17-213)."""

    def __init__(self, cam: CalibratedCamera):
        self.cam_dist = cam
        self.cam_undist = cam.undistorted_twin()
        self.map_x, self.map_y = self._compute_maps()

    def _compute_maps(self) -> Tuple[np.ndarray, np.ndarray]:
        h, w = self.cam_undist.height, self.cam_undist.width
        uu, vv = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
        x, y = self.cam_undist.image_to_camera_pinhole(uu, vv)
        u_d, v_d = self.cam_dist.camera_to_image(x, y)
        return u_d.astype(np.float32), v_d.astype(np.float32)

    def undistort_image(self, img: np.ndarray) -> np.ndarray:
        """HWC image -> undistorted HWC image (bilinear remap)."""
        if not _HAS_CV2:
            raise RuntimeError("cv2 required for undistortion remap")
        return cv2.remap(img, self.map_x, self.map_y, interpolation=cv2.INTER_LINEAR)

    def intrinsics_matrix(self) -> np.ndarray:
        return self.cam_undist.intrinsics_matrix()


def create_undistorter(calib_path: str, scale: float = 1.0) -> Undistorter:
    """Factory mirroring utils/undistortion_utils.create_undistortion_maps."""
    return Undistorter(CalibratedCamera.from_file(calib_path, scale))
