"""Asynchronous mapping pipeline: tracking continues while local BA, plane
mapping and loop closing run on a background executor.

TPU-native equivalent of the reference's three-thread layout (Tracking ||
LocalMapping || LoopClosing with mutex-protected queues — SURVEY.md §2.2,
§2.3).  The reference's per-object mutex web collapses to:

* a single MapStore lock held only for SHORT host-side mutation sections
  (keyframe insertion, BA write-back, pose-graph write-back) — the heavy
  device computations (local BA solve, pose graph) run OUTSIDE the lock and
  release the GIL while the TPU works, so tracking genuinely overlaps;
* append-only ids (points/keyframes never reuse slots), which makes
  write-backs structurally race-free: a BA write-back touches only ids that
  existed when its window was assembled;
* a version counter for snapshot invalidation (the tracker's local-map
  device snapshot is rebuilt only when the map changed).

The executor coalesces queued keyframes: if tracking outruns mapping, BA
runs on the newest keyframe only (the reference aborts BA via mbAbortBA in
the same situation).
"""

from __future__ import annotations

import threading
from collections import deque


class AsyncMappingPipeline:
    def __init__(self, system):
        self.system = system
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._stop = False
        self._busy = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        self.n_processed = 0
        self.n_coalesced = 0

    # -----------------------------------------------------------------
    def submit(self, kf: int, gray, depth):
        with self._cv:
            self._queue.append((kf, gray, depth))
            self._cv.notify()

    def idle(self) -> bool:
        with self._cv:
            return not self._queue and not self._busy

    def queue_len(self) -> int:
        """Queued + in-flight keyframes (the reference's mlNewKeyFrames.size()
        + busy indicator, used by the keyframe-insertion throttle)."""
        with self._cv:
            return len(self._queue) + (1 if self._busy else 0)

    def flush(self, timeout: float = 120.0):
        """Block until all queued keyframes are processed."""
        import time

        t0 = time.time()
        while not self.idle() and time.time() - t0 < timeout:
            time.sleep(0.005)

    def shutdown(self):
        self.flush()
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join(timeout=10.0)

    # -----------------------------------------------------------------
    def _worker(self):
        sys_ = self.system
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop and not self._queue:
                    return
                # coalesce: plane/loop handling per KF is cheap and runs for
                # all; the expensive BA runs once for the newest queued KF
                items = list(self._queue)
                self._queue.clear()
                self._busy = True
            try:
                for i, (kf, gray, depth) in enumerate(items):
                    newest = i == len(items) - 1
                    # a failure on ONE keyframe must never kill the worker
                    # thread — the run would silently continue without
                    # mapping/loop closing (observed once via an escaped
                    # wait timeout); log and keep consuming
                    try:
                        if sys_.plane_mapper is not None:
                            sys_.plane_mapper.process_keyframe(kf, gray, depth)
                        sys_.mapper.process_keyframe(
                            kf, run_ba=sys_.cfg.local_ba and newest
                        )
                        if sys_.loop_closer is not None:
                            closed = sys_.loop_closer.process_keyframe(
                                kf, detect=sys_.cfg.use_loop
                            )
                            if closed:
                                with sys_.store.lock:
                                    sys_.tracker.external_pose_correction(
                                        sys_.store.kf_pose[kf]
                                    )
                        # producer-side snapshot refresh: the BA write-back
                        # just bumped the store version; re-gather+upload
                        # HERE (mapper thread) so the tracker's next dispatch
                        # hits a warm cache instead of paying the gather on
                        # its critical path
                        sys_.tracker.refresh_snapshot_values()
                    except Exception:
                        import logging

                        logging.getLogger(__name__).exception(
                            "mapping worker: keyframe %d failed; continuing",
                            kf,
                        )
                    self.n_processed += 1
                self.n_coalesced += max(len(items) - 1, 0)
            finally:
                with self._cv:
                    self._busy = False
