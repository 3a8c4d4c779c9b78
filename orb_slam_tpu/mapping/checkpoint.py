"""Map checkpoint/resume: save and load the whole SoA map state.

The reference has NO map persistence (SURVEY.md §5.4 — only the terminal
trajectory dump).  The flat SoA layout makes checkpointing trivial: every
MapState leaf is an array, so a snapshot is one npz, restorable mid-run —
a first-class capability beyond reference parity.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import MapConfig
from .mapstore import MapState, SlamMap


def save_map(path: str, smap: SlamMap) -> None:
    arrays = {f"state_{k}": np.asarray(v) for k, v in smap.state._asdict().items()}
    np.savez_compressed(
        path,
        n_kf=smap.n_kf,
        n_mp=smap.n_mp,
        parent=smap.parent,
        loop_edges=np.asarray(smap.loop_edges or [], np.int64).reshape(-1, 2),
        kf_frame_id=smap.kf_frame_id,
        kf_timestamp=smap.kf_timestamp,
        **arrays,
    )


def load_map(path: str, cfg: MapConfig) -> SlamMap:
    import dataclasses
    data = np.load(path, allow_pickle=False)
    state = MapState(**{
        k: jnp.asarray(data[f"state_{k}"]) for k in MapState._fields
    })
    # the pool may have grown past the configured capacity before the save
    # (mapstore.grow_keyframes); the arrays are the source of truth
    saved_K = state.kf_valid.shape[0]
    if saved_K != cfg.max_keyframes:
        cfg = dataclasses.replace(cfg, max_keyframes=saved_K)
    return SlamMap(
        state=state,
        cfg=cfg,
        n_kf=int(data["n_kf"]),
        n_mp=int(data["n_mp"]),
        parent=data["parent"],
        loop_edges=[tuple(e) for e in data["loop_edges"]],
        kf_frame_id=data["kf_frame_id"],
        kf_timestamp=data["kf_timestamp"],
        obs_np=np.array(data["state_kf_obs"], np.int32, copy=True),
        kf_valid_np=np.array(data["state_kf_valid"], bool, copy=True),
        mp_valid_np=np.array(data["state_mp_valid"], bool, copy=True),
        host={name: np.array(data[f"state_{name}"], copy=True)
              for name in ("kf_R", "kf_t", "kf_xy", "kf_level", "kf_desc",
                           "kf_kp_valid", "mp_pos", "mp_first_kf",
                           "mp_found", "mp_visible")},
    )
