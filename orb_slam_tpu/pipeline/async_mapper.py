"""Asynchronous keyframe-rate work: local mapping + loop closing off the
camera-rate path.

The reference runs LocalMapping and LoopClosing on their own threads over a
mutex-guarded map (src/main.cc:123-133); here every mapping kernel is a pure
function of (map snapshot, keyframe), so the same decoupling needs no locks:

  * on keyframe insertion the tracker snapshots the SlamMap (the device
    MapState is an immutable pytree — a snapshot is a reference copy) and
    submits it to a worker thread;
  * the worker runs LocalMapper.process_keyframe + LoopCloser.process_keyframe
    on its snapshot while the tracker keeps tracking camera frames against
    its own (slightly stale) map — exactly the reference's semantics, where
    tracking reads the map while mapping mutates it;
  * while the worker is busy the tracker does not insert keyframes — the
    reference's SetAcceptKeyFrames(false) backpressure
    (src/LocalMapping.cc:522-532, Tracking.cc:654-685);
  * when the worker finishes, the tracker commits: adopts the worker's map
    state and re-applies the landmark visible/found deltas it accumulated
    meanwhile (the only tracker-side writes), remapped through the
    compaction LUT if the worker compacted the point pool.

The serialized-commit design replaces the reference's per-object mutexes
(SURVEY.md §2.3) — there is exactly one writer per array generation.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..mapping import mapstore
from ..utils.timing import GLOBAL_TIMER as _timer


def snapshot_map(smap: mapstore.SlamMap) -> mapstore.SlamMap:
    """Cheap snapshot: device arrays are immutable (shared), host-side
    arrays/lists are copied."""
    return dataclasses.replace(
        smap,
        parent=smap.parent.copy(),
        loop_edges=list(smap.loop_edges),
        kf_frame_id=smap.kf_frame_id.copy(),
        kf_timestamp=smap.kf_timestamp.copy(),
        obs_np=smap.obs_np.copy(),
        kf_valid_np=smap.kf_valid_np.copy(),
        mp_valid_np=smap.mp_valid_np.copy(),
        host={k: v.copy() for k, v in smap.host.items()},
    )


@dataclasses.dataclass
class MappingResult:
    smap: mapstore.SlamMap
    kf: int
    metrics: dict
    snap_visible: jnp.ndarray       # stat baselines at submission time
    snap_found: jnp.ndarray
    remap_lut: Optional[np.ndarray]  # old->new point ids if pool compacted
    culled_kfs: list
    error: Optional[BaseException] = None


class AsyncMapper:
    """Single-worker mapping thread with a one-deep submission queue.

    service_polls > 0 pins the worker's VISIBLE service interval to
    exactly that many poll() calls (= tracked frames, since the tracker
    polls once per frame): poll() withholds the result until the N-th
    call after submit, then blocks for it if the thread hasn't finished.
    Real wall-clock timing makes the commit schedule — and therefore
    every keyframe decision downstream — a function of machine load and
    compile-cache state; pinning it makes long pipeline runs bit-
    reproducible across machines (the endurance suite's trajectories
    flipped between cache-warm and cache-cold runs of the same build
    before this).  0 = live timing.  flush() (the starved-tracker drain,
    Tracking.cc:679-685 analog) bypasses the pin by design."""

    def __init__(self, local_mapper, loop_closer, service_polls: int = 0):
        self.local_mapper = local_mapper
        self.loop_closer = loop_closer
        self._in: "queue.Queue" = queue.Queue(maxsize=1)
        self._out: "queue.Queue" = queue.Queue(maxsize=1)
        self._busy = False
        self._service_polls = int(service_polls)
        self._polls_since_submit = 0
        # keyframe-pressure signals from the tracker (the reference's
        # InterruptBA / CheckNewKeyFrames pair — see
        # LocalMapper.process_keyframe): set while a job is in flight,
        # cleared on the next submission
        self.interrupt_ba = threading.Event()
        self.kf_queued = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    @property
    def busy(self) -> bool:
        return self._busy

    def submit(self, smap: mapstore.SlamMap, kf: int):
        assert not self._busy, "submit while busy (backpressure violated)"
        self._busy = True
        self.interrupt_ba.clear()
        self.kf_queued.clear()
        self._polls_since_submit = 0
        snap = snapshot_map(smap)
        self._in.put((snap, kf, smap.state.mp_visible, smap.state.mp_found))

    def poll(self) -> Optional[MappingResult]:
        """Non-blocking: the finished result, or None.  Under a pinned
        service interval (service_polls > 0) the result becomes visible
        at exactly the N-th poll after submit, blocking for the worker
        if needed."""
        if self._service_polls > 0 and self._busy:
            self._polls_since_submit += 1
            if self._polls_since_submit < self._service_polls:
                return None
            return self.flush()
        try:
            res = self._out.get_nowait()
        except queue.Empty:
            return None
        self._busy = False
        if res.error is not None:
            raise res.error
        return res

    def flush(self, timeout: float = 300.0) -> Optional[MappingResult]:
        """Block until the in-flight job (if any) completes."""
        if not self._busy:
            return None
        res = self._out.get(timeout=timeout)
        self._busy = False
        if res.error is not None:
            raise res.error
        return res

    def shutdown(self):
        self._in.put(None)
        self._thread.join(timeout=30.0)

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                return
            smap, kf, snap_vis, snap_found = item
            try:
                smap.last_compaction_lut = None
                metrics = self.local_mapper.process_keyframe(
                    smap, kf, interrupt_ba=self.interrupt_ba.is_set,
                    kf_queued=self.kf_queued.is_set)
                # compaction during mapping remaps point ids; hand the LUT
                # to the tracker so it can remap its in-flight associations
                lut = smap.last_compaction_lut
                smap.last_compaction_lut = None
                culled = list(self.local_mapper.last_culled_kfs or [])
                if self.loop_closer is not None and \
                        self.loop_closer.db is not None:
                    for ck in culled:
                        self.loop_closer.db = self.loop_closer.db.remove(ck)
                        self.loop_closer.kf_bow.pop(ck, None)
                if self.loop_closer is not None and \
                        self.loop_closer.voc is not None:
                    with _timer.stage("mapping", "loopClosing"):
                        lc_metrics = self.loop_closer.process_keyframe(
                            smap, kf)
                    metrics.update(lc_metrics)
                self._out.put(MappingResult(
                    smap=smap, kf=kf, metrics=metrics,
                    snap_visible=snap_vis, snap_found=snap_found,
                    remap_lut=lut, culled_kfs=culled))
            except BaseException as e:  # surfaced at the next poll
                self._out.put(MappingResult(
                    smap=smap, kf=kf, metrics={},
                    snap_visible=snap_vis, snap_found=snap_found,
                    remap_lut=None, culled_kfs=[], error=e))
