"""Per-frame record: extractor output + undistorted coordinates + per-level
information weights (the Frame of src/Frame.cc, minus the lookup grid — on
TPU, radius queries are dense masked scans, so no grid is needed)."""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import ExtractorConfig
from ..frontend.extractor import FrameFeatures
from ..geometry import camera as cam_mod


class FrameData(NamedTuple):
    feats: FrameFeatures
    xy_und: jnp.ndarray      # [N, 2] undistorted keypoint coords
    inv_sigma2: jnp.ndarray  # [N] 1 / sigma^2(level)
    sigma2: jnp.ndarray      # [N]


@jax.jit
def _undistort(xy, cam: cam_mod.CameraParams):
    return cam_mod.undistort_pixels(xy, cam)


def build_frame(feats: FrameFeatures, cam: cam_mod.CameraParams,
                ext_cfg: ExtractorConfig) -> FrameData:
    xy_und = _undistort(feats.xy, cam)
    scale2 = jnp.asarray(ext_cfg.sigma2)           # [L]
    s2 = scale2[jnp.clip(feats.level, 0, ext_cfg.n_levels - 1)]
    return FrameData(
        feats=feats,
        xy_und=xy_und,
        inv_sigma2=1.0 / s2,
        sigma2=s2,
    )
